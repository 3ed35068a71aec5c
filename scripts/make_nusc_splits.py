"""Generate the nuScenes official-splits JSON consumed by
`Nuscenes(..., splits_file=...)` / the `nusc_splits_file` config key.

Run on any machine with the nuscenes-devkit installed:

    python scripts/make_nusc_splits.py nusc_splits.json

The 700/150-scene trainval lists are curated devkit constants
(nuscenes/utils/splits.py). The 150-scene val list is also embedded in
pmf_tpu/data/nuscenes.py (train = complement over the trainval DB); this
extractor produces an override/cross-check file from a live devkit.
Parity: the reference imports them directly
(pc_processor/dataset/nuScenes/dataset_nuscenes.py:13,85).
"""
import json
import sys


def main(out_path: str) -> None:
    from nuscenes.utils import splits

    payload = {
        "train": list(splits.train),
        "val": list(splits.val),
        "test": list(splits.test),
        "mini_train": list(splits.mini_train),
        "mini_val": list(splits.mini_val),
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out_path}: " +
          ", ".join(f"{k}={len(v)}" for k, v in payload.items()))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "nusc_splits.json")
