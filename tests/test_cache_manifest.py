"""Persistent-cache seeding discipline (VERDICT r4 item 1).

Rounds 3 and 4 both shipped final code changes AFTER the last full warmup
run, so the driver's fresh-process bench paid real compiles (695 s) where a
seeded cache pays loads (~95 s). This test pins the checklist item: the
committed `.cache_manifest.json` must match a hash of the CURRENT source
tree — i.e. `python tools/seed_cache.py` must have been re-run (on the TPU)
after the last change to any file that can influence compiled executables.
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cache_manifest_matches_source_tree():
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import seed_cache

    path = os.path.join(REPO, ".cache_manifest.json")
    if not os.path.exists(path):
        pytest.fail(
            ".cache_manifest.json missing — run `python tools/seed_cache.py` "
            "(TPU) after the round's final code change")
    with open(path) as f:
        manifest = json.load(f)
    assert manifest.get("tree_hash") == seed_cache.tree_hash(), (
        "source tree changed since the last cache seed — re-run "
        "`python tools/seed_cache.py` on the TPU so the driver bench pays "
        "cache loads, not compiles")
