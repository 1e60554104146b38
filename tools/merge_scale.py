#!/usr/bin/env python3
"""Merge a targeted ScaleBench record into the committed SCALE_LOCAL.json.

`ScaleBench run <out> --only=q1,q2 <tiers...>` writes a FRESH JSON
containing only what it measured — per-tier query rows for the --only
set plus the tier-wide special rows — dropping everything else
(including the x100_resume / x100_incremental / x100_stream_build
operational records). Run the targeted record to a scratch file and
merge it here:

    sbt "runMain graft.ScaleBench run /tmp/scale_new.json --only=... tiers..."
    python3 tools/merge_scale.py /tmp/scale_new.json SCALE_LOCAL.json

Per tier, new query rows update the old tier's `queries` map and new
special rows replace the old ones; tiers and top-level records absent
from the new file are preserved.
"""
import json
import sys


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit("usage: merge_scale.py <new.json> <target.json>")
    new = json.load(open(sys.argv[1]))
    target = json.load(open(sys.argv[2]))
    for tier, rec in new.items():
        if tier not in target or not isinstance(rec, dict):
            target[tier] = rec
            continue
        for k, v in rec.items():
            if k == "queries" and isinstance(target[tier].get(k), dict):
                target[tier][k].update(v)
            else:
                target[tier][k] = v
    json.dump(target, open(sys.argv[2], "w"), indent=1)
    print(f"merged {sys.argv[1]} into {sys.argv[2]}")


if __name__ == "__main__":
    main()
