#!/usr/bin/env python
"""Filter a comp1k JSON annotation down to a target file-name list (the
analog of /root/reference/tools/data/matting/comp1k/filter_comp1k_anno.py:
keep records whose alpha_path ends with any listed name).

    python tools/data/filter_comp1k_anno.py ANN.json TARGETS.txt OUT.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def filter_anno(records, targets):
    return [
        r for r in records
        if any(r["alpha_path"].endswith(t) for t in targets)
    ]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("comp1k_json_path")
    p.add_argument("target_list_path")
    p.add_argument("save_json_path")
    args = p.parse_args()

    records = json.loads(Path(args.comp1k_json_path).read_text())
    targets = [
        ln.strip()
        for ln in Path(args.target_list_path).read_text().splitlines()
        if ln.strip()
    ]
    kept = filter_anno(records, targets)
    Path(args.save_json_path).write_text(json.dumps(kept, indent=1))
    print(f"kept {len(kept)}/{len(records)} records")


if __name__ == "__main__":
    main()
