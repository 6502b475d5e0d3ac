"""Wheel packaging smoke test: build (if no wheel given), install into a
clean venv with the C++ compiler masked out, and prove the installed
package (a) loads the wheel-shipped native library without compiling and
(b) answers oracle-checked queries.

Usage: python scripts/wheel_smoke.py [path/to/wheel]
"""

import glob
import os
import subprocess
import sys
import tempfile

SNIPPET = r"""
import os, sys
import numpy as np
# mask any compiler so a fallback compile would fail loudly
os.environ["PATH"] = os.environ.get("VENV_BIN", "")
from aindex_tpu import native
assert native.available(), "wheel-shipped native library did not load"
assert "_native" in native._SO_PATH or "native" in native._SO_PATH, native._SO_PATH
from aindex_tpu import AIndex
from aindex_tpu.core import codec
rng = np.random.default_rng(9)
reads = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(12)]
gold = {}
for r in reads:
    for i in range(len(r) - 22):
        km = min(r[i:i+23], codec.revcomp(r[i:i+23]))
        gold[km] = gold.get(km, 0) + 1
ai = AIndex.build_from_sequences(reads, kmer_size=23)
kms = sorted(gold)
got = [int(v) for v in ai.get_tf_values(kms)]
assert got == [gold[km] for km in kms], "query mismatch"
print("wheel smoke OK:", native._SO_PATH, f"({len(kms)} kmers)")
"""


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if len(sys.argv) > 1:
        wheels = sorted(glob.glob(sys.argv[1]))
    else:
        subprocess.run([sys.executable, "-m", "pip", "wheel", here,
                        "--no-deps", "--no-build-isolation",
                        "-w", os.path.join(here, "dist")],
                       check=True)
        wheels = sorted(glob.glob(os.path.join(here, "dist", "*.whl")))
    assert wheels, "no wheel built"
    wheel = wheels[-1]
    with tempfile.TemporaryDirectory() as td:
        venv = os.path.join(td, "venv")
        subprocess.run([sys.executable, "-m", "venv", "--system-site-packages",
                        venv], check=True)
        py = os.path.join(venv, "bin", "python")
        subprocess.run([py, "-m", "pip", "install", "--no-deps", "-q", wheel],
                       check=True)
        # deps (numpy/jax) come from the invoking interpreter's
        # site-packages via PYTHONPATH — the venv's own site-packages
        # (holding the wheel install) takes precedence, so aindex_tpu
        # itself resolves to the wheel, not any dev checkout
        import numpy
        site = os.path.dirname(os.path.dirname(numpy.__file__))
        env = dict(os.environ, VENV_BIN=os.path.join(venv, "bin"),
                   JAX_PLATFORMS="cpu", PYTHONPATH=site)
        r = subprocess.run([py, "-c", SNIPPET], env=env, cwd=td)
        sys.exit(r.returncode)


if __name__ == "__main__":
    main()
