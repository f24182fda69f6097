"""PairGenerator sampling semantics + DataLoader behavior."""

import numpy as np
import pytest

from pets_face_recognition_tpu.data_loading import DataLoader, PairGenerator


class FakeRecDataset:
    """Minimal uid_to_indices carrier matching RecDataset's interface."""

    def __init__(self, uid_to_indices):
        self.uid_to_indices = uid_to_indices
        self._n = sum(len(v) for v in uid_to_indices.values())
        self.index_to_uid = {
            i: uid for uid, idx in uid_to_indices.items() for i in idx
        }

    def __len__(self):
        return self._n

    def __getitem__(self, item):
        return {"x": np.full((4, 4, 3), item, np.float32),
                "label": self.index_to_uid[item], "index": item}


@pytest.fixture
def fake_ds():
    return FakeRecDataset({0: [0, 1, 2], 1: [3, 4], 2: [5, 6, 7, 8]})


def test_pairs_labels_and_identity_structure(fake_ds):
    pg = PairGenerator(fake_ds, gen_number=10, gen_ratio=1.0, random_seed=7,
                       usr_list=[0, 1, 2])
    labels = pg.labels
    for (a, b), lbl in zip(pg.indices, labels):
        same = fake_ds.index_to_uid[a] == fake_ds.index_to_uid[b]
        assert same == bool(lbl)
        assert a != b
    assert labels.sum() > 0 and (1 - labels).sum() > 0


def test_pairs_deterministic_given_seed(fake_ds):
    p1 = PairGenerator(fake_ds, gen_number=8, random_seed=3, usr_list=[0, 1, 2])
    p2 = PairGenerator(fake_ds, gen_number=8, random_seed=3, usr_list=[0, 1, 2])
    assert p1.pairs == p2.pairs
    p3 = PairGenerator(fake_ds, gen_number=8, random_seed=4, usr_list=[0, 1, 2])
    assert p1.pairs != p3.pairs


def test_pairs_usr_list_scoping(fake_ds):
    pg = PairGenerator(fake_ds, gen_number=4, random_seed=0, usr_list=[0, 2])
    in_scope = set(fake_ds.uid_to_indices[0]) | set(fake_ds.uid_to_indices[2])
    for a, b in pg.indices:
        assert a in in_scope and b in in_scope


def test_correction_is_rank_in_scope(fake_ds):
    pg = PairGenerator(fake_ds, gen_number=4, random_seed=0, usr_list=[1, 2])
    # in-scope indices: 3..8 -> ranks 0..5
    assert pg.correction == {i: i - 3 for i in range(3, 9)}
    for (a, b), (ca, cb) in zip(pg.indices, pg.corrected_indices):
        assert ca == pg.correction[a] and cb == pg.correction[b]


def test_pair_pickle_cache_roundtrip(fake_ds, tmp_path):
    cache = tmp_path / "pairs.pickle"
    p1 = PairGenerator(fake_ds, gen_number=6, random_seed=5, usr_list=[0, 1, 2],
                       path=str(cache))
    assert cache.exists()
    p2 = PairGenerator(fake_ds, gen_number=999, random_seed=999,
                       usr_list=[0], path=str(cache))  # params ignored: cache hit
    assert p1.pairs == p2.pairs and p1.correction == p2.correction


def test_dataloader_batching(fake_ds):
    dl = DataLoader(fake_ds, batch_size=4, shuffle=False, num_workers=0)
    batches = list(dl)
    assert len(batches) == 3  # 9 samples, no drop_last when not shuffling
    assert batches[0]["x"].shape == (4, 4, 4, 3)
    assert batches[-1]["x"].shape == (1, 4, 4, 3)
    assert list(batches[0]["index"]) == [0, 1, 2, 3]


def test_dataloader_shuffle_drop_last_deterministic(fake_ds):
    dl1 = DataLoader(fake_ds, batch_size=4, shuffle=True, seed=11, num_workers=0)
    dl2 = DataLoader(fake_ds, batch_size=4, shuffle=True, seed=11, num_workers=0)
    b1, b2 = list(dl1), list(dl2)
    assert len(b1) == 2  # drop_last
    np.testing.assert_array_equal(b1[0]["index"], b2[0]["index"])
    # second epoch shuffles differently
    b1e2 = list(dl1)
    assert not all(
        np.array_equal(x["index"], y["index"]) for x, y in zip(b1, b1e2)
    )


def test_dataloader_threaded_matches_sync(fake_ds):
    sync = list(DataLoader(fake_ds, batch_size=3, shuffle=False, num_workers=0))
    thr = list(DataLoader(fake_ds, batch_size=3, shuffle=False, num_workers=4))
    for a, b in zip(sync, thr):
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["index"], b["index"])


def test_dataloader_propagates_worker_errors():
    class Boom:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        list(DataLoader(Boom(), batch_size=2, num_workers=2))
