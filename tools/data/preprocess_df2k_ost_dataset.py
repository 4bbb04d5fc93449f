#!/usr/bin/env python
"""DF2K_OST (DIV2K + Flickr2K + OST) prep for RealBasicVSR-style training
(the analog of
/root/reference/tools/data/super-resolution/df2k_ost/preprocess_df2k_ost_dataset.py):
sub-image extraction, meta-info key list, and optional LMDB packing.

    python tools/data/preprocess_df2k_ost_dataset.py --data-root ROOT \
        [--crop-size 400] [--step 200] [--thresh-size 0] [--n-thread 4] \
        [--make-lmdb]

Sub-images land in ``ROOT_sub/`` as flat files ``<name>_s<idx>.png``
(reference worker naming, preprocess_df2k_ost_dataset.py:76-120), keys in
``ROOT_sub/meta_info.txt``. ``--make-lmdb`` packs them into
``ROOT_sub.lmdb`` (needs the ``lmdb`` package; absent in this
environment, so it raises a clear ImportError — matching the gated
SRLmdbDataset reader, data/sisr_datasets.py:217-250).
"""

from __future__ import annotations

import argparse
import sys
from multiprocessing import Pool
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from crop_sub_images import crop_windows  # noqa: E402


def worker(job):
    from PIL import Image

    path, save_folder, crop_size, step, thresh_size = job
    path = Path(path)
    img = np.asarray(Image.open(path))
    names = []
    for index, (x, y) in enumerate(
        crop_windows(img.shape[0], img.shape[1], crop_size, step, thresh_size),
        start=1,
    ):
        name = f"{path.stem}_s{index:03d}.png"
        Image.fromarray(img[x : x + crop_size, y : y + crop_size]).save(
            Path(save_folder) / name
        )
        names.append(name)
    return names


def make_lmdb(img_folder: Path, lmdb_path: Path):
    """Pack a flat image folder into an lmdb with a meta_info.txt (the
    reference's make_lmdb, preprocess_df2k_ost_dataset.py:162-278)."""
    try:
        import lmdb
    except ImportError as e:
        raise ImportError(
            "--make-lmdb needs the 'lmdb' package (not bundled in this "
            "environment); the sub-image folder output works without it"
        ) from e
    import io

    from PIL import Image

    files = sorted(img_folder.glob("*.png"))
    env = lmdb.open(str(lmdb_path), map_size=1099511627776)
    meta = []
    with env.begin(write=True) as txn:
        for f in files:
            img = Image.open(f)
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            txn.put(f.stem.encode(), buf.getvalue())
            meta.append(f"{f.stem}.png ({img.height},{img.width},3) 1")
    (lmdb_path / "meta_info.txt").write_text("\n".join(meta) + "\n")
    env.close()


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", required=True)
    p.add_argument("--crop-size", type=int, default=400)
    p.add_argument("--step", type=int, default=200)
    p.add_argument("--thresh-size", type=int, default=0)
    p.add_argument("--n-thread", type=int, default=4)
    p.add_argument("--make-lmdb", action="store_true")
    args = p.parse_args()

    root = Path(args.data_root)
    save = root.parent / (root.name + "_sub")
    save.mkdir(parents=True, exist_ok=True)
    imgs = sorted(
        f for f in root.rglob("*")
        if f.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    jobs = [
        (str(f), str(save), args.crop_size, args.step, args.thresh_size)
        for f in imgs
    ]
    all_names = []
    if args.n_thread > 1:
        with Pool(args.n_thread) as pool:
            for names in pool.imap(worker, jobs):
                all_names.extend(names)
    else:
        for j in jobs:
            all_names.extend(worker(j))
    (save / "meta_info.txt").write_text("\n".join(sorted(all_names)) + "\n")
    print(f"{len(all_names)} sub-images -> {save}")

    if args.make_lmdb:
        make_lmdb(save, root.parent / (root.name + "_sub.lmdb"))
        print(f"lmdb -> {root.name}_sub.lmdb")


if __name__ == "__main__":
    main()
