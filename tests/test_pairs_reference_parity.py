"""Differential parity: our PairGenerator vs the REAL reference sampler.

``/root/reference/data_loading/pairs.py`` is numpy + torch.utils.data only
(importable here once ``albumentations``/``pipe`` — used by its sibling
``dataset`` module — are stubbed). The pair *set and order* drive the FE
verification metrics and README-table parity, so this pins the exact RNG call
sequence: one ``RandomState.choice(len(pairs), n, replace=False)`` per
identity, positives first then negatives, identities in ``uid_to_indices``
insertion order, plus the correction-map construction (ref ``pairs.py:31-96``).

The duck-typed fake dataset only exposes ``uid_to_indices`` and ``__len__`` —
exactly what ``generate_pairs`` touches.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from pets_face_recognition_tpu.data_loading.pairs import PairGenerator

REF_PAIRS = Path("/root/reference/data_loading/pairs.py")

pytestmark = pytest.mark.skipif(
    not REF_PAIRS.exists(), reason="reference pairs.py not present"
)


def _load_ref_pairs():
    for stub_name, attrs in (
        ("albumentations", {"bbox_rot90": None, "keypoint_rot90": None,
                            "rotate": None, "bbox_rotate": None,
                            "keypoint_rotate": None}),
        ("pipe", {"where": lambda *a, **k: None}),
    ):
        if stub_name not in sys.modules:
            mod = types.ModuleType(stub_name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[stub_name] = mod
    pkg = types.ModuleType("ref_dl")
    pkg.__path__ = [str(REF_PAIRS.parent)]
    sys.modules["ref_dl"] = pkg
    spec = importlib.util.spec_from_file_location("ref_dl.pairs", REF_PAIRS)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_dl.pairs"] = mod
    spec.loader.exec_module(mod)
    return mod


class _FakeDataset:
    """Duck-typed RecDataset: sorted-uid insertion order, contiguous-ish
    global indices with gaps (so the correction map is non-trivial)."""

    def __init__(self, seed=0, n_users=12, max_imgs=5, stride=3):
        rng = np.random.RandomState(seed)
        self.uid_to_indices = {}
        nxt = 0
        for u in range(n_users):
            n = 1 + rng.randint(max_imgs)
            idx = []
            for _ in range(n):
                idx.append(nxt)
                nxt += 1 + rng.randint(stride)  # index gaps
            self.uid_to_indices[f"uid{u:03d}"] = idx
        self._len = nxt

    def __len__(self):
        return self._len


@pytest.mark.parametrize("seed,gen_ratio,n_users", [(0, 1, 12), (7, 2, 9)])
def test_generated_pairs_match_reference(seed, gen_ratio, n_users):
    ref = _load_ref_pairs()
    ds = _FakeDataset(seed=seed, n_users=n_users)
    usr_list = list(ds.uid_to_indices)[: n_users - 2]

    theirs = ref.PairGenerator(ds, gen_ratio=gen_ratio, random_seed=123,
                               usr_list=usr_list)
    ours = PairGenerator(ds, gen_ratio=gen_ratio, random_seed=123,
                         usr_list=usr_list)

    assert [tuple(p) for p in theirs.pairs] == [tuple(p) for p in ours.pairs]
    assert theirs.correction == ours.correction
    np.testing.assert_array_equal(theirs.labels, ours.labels)
    assert theirs.corrected_indices == ours.corrected_indices


def test_gen_number_capping_matches_reference():
    ref = _load_ref_pairs()
    ds = _FakeDataset(seed=3, n_users=10, max_imgs=6)
    usr_list = list(ds.uid_to_indices)
    theirs = ref.PairGenerator(ds, gen_number=20, gen_ratio=1,
                               random_seed=5, usr_list=usr_list)
    ours = PairGenerator(ds, gen_number=20, gen_ratio=1,
                         random_seed=5, usr_list=usr_list)
    assert [tuple(p) for p in theirs.pairs] == [tuple(p) for p in ours.pairs]
    assert theirs.correction == ours.correction
