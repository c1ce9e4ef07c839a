#!/usr/bin/env python3
"""Prune .jax_cache to the LIVE executable set (CLAUDE.md recipe).

Usage: python scripts/prune_cache.py LOG [LOG...] [--apply]

Each LOG is a run captured with JAX_DEBUG_LOG_MODULES=jax._src.lru_cache
(bench, ci_local incl. dryrun + bench smoke, entry-compile probe).  The
union of 'Cache hit'/'Cache miss' keys across the logs is the live set;
everything else in .jax_cache is an orphan from superseded code (the
cache key embeds HLO source line numbers, so edits strand old entries).
Dry-run by default; --apply deletes.
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")


def main():
    args = [a for a in sys.argv[1:] if a != "--apply"]
    apply = "--apply" in sys.argv
    keys = set()
    pat = re.compile(r"Cache (?:hit|miss) for key: '([^']+)'")
    for log in args:
        with open(log, errors="replace") as f:
            for line in f:
                m = pat.search(line)
                if m:
                    keys.add(m.group(1))
    print(f"live keys from {len(args)} logs: {len(keys)}")
    entries = sorted(os.listdir(CACHE))
    keep = drop = keep_b = drop_b = 0
    for e in entries:
        base = e[:-len("-cache")] if e.endswith("-cache") else e
        p = os.path.join(CACHE, e)
        sz = os.path.getsize(p)
        if base in keys:
            keep += 1
            keep_b += sz
        else:
            drop += 1
            drop_b += sz
            if apply:
                os.remove(p)
    print(f"keep {keep} entries ({keep_b/1e6:.0f} MB), "
          f"{'DELETED' if apply else 'would delete'} {drop} "
          f"({drop_b/1e6:.0f} MB)")


if __name__ == "__main__":
    main()
