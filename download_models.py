"""Download the frozen reproduce bundle (checkpoints + configs) into ``configs/``.

Reference ``download_models.py``: fetches ``to_reproduce.zip`` from Zenodo v1.2.
NOTE: the shipped FE checkpoints omit the ``add_margin`` head weights, which is why
every loader here merges non-strictly. Offline images will fail fast at download.
"""

import zipfile
from pathlib import Path
from urllib.request import urlretrieve

URL = "https://zenodo.org/record/6664769/files/to_reproduce.zip?download=1"


def main():
    dest = Path("configs")
    dest.mkdir(exist_ok=True)
    archive = dest / "to_reproduce.zip"
    if not (dest / "to_reproduce").exists():
        if not archive.exists():
            print(f"downloading {URL}")
            urlretrieve(URL, archive)
        with zipfile.ZipFile(archive) as z:
            z.extractall(dest)
        archive.unlink()
    print("done")


if __name__ == "__main__":
    main()
