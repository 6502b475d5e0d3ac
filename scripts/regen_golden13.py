#!/usr/bin/env python3
"""Regenerate (and verify) the golden 13-mer emphf hash from scratch.

``EmphfPF.build_exact`` is a bit-exact twin of the reference's
compute_mphf_seq construction (mt19937_64(37) seed sequence, sequential
peel order, emphf assignment); this script rebuilds the full 4^13 hash
(~3 min: vectorised Jenkins hashing + the native sequential peel) and
checks its sha256 against the committed golden artifact
tests/golden_ref/p.13.pf.gz. Run it to re-verify provenance or to
recreate the artifact without the reference toolchain.
"""

import gzip
import hashlib
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aindex_tpu.constants import SPACE_13  # noqa: E402
from aindex_tpu.index.emphf import EmphfPF  # noqa: E402

GOLD_GZ = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "golden_ref", "p.13.pf.gz")


def main() -> int:
    t0 = time.time()
    pf = EmphfPF.build_exact(np.arange(SPACE_13, dtype=np.uint64), 13)
    print(f"build_exact over 4^13 keys: {time.time() - t0:.1f}s "
          f"(seed {pf.seed:#x})")
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "p.13.pf")
        pf.save(out)
        ours = hashlib.sha256(open(out, "rb").read()).hexdigest()
    with gzip.open(GOLD_GZ, "rb") as f:
        gold = hashlib.sha256(f.read()).hexdigest()
    print(f"rebuilt : {ours}\ncommitted: {gold}")
    if ours != gold:
        print("MISMATCH — the builder is no longer bit-exact")
        return 1
    print("byte-identical to the reference-built artifact")
    return 0


if __name__ == "__main__":
    sys.exit(main())
