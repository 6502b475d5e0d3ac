"""Bit-level 13-mer interop with reference-built golden artifacts.

``tests/golden_ref/p.13.*`` and ``p.13.pf.gz`` were produced by the
unmodified reference C++ 13-mer pipeline over ``p.reads`` (see
golden_ref/README.md):

    generate_all_13mers -> build_13mer_hash (emphf over all 4^13 13-mers)
    count_kmers13 p.reads 13mer_index.pf p.13.tf.bin      (slot-ordered)
    compute_aindex13 p.reads ... p.13                     (slot-keyed CSR)

These tests pin the slot-order re-keying load path
(AIndex.load_from_prefix 13-mer branch / Dense13Index.load with pf_path)
bit-exactly: the reference's slot-ordered table re-keyed by our emphf
reader must equal OUR OWN dense count of the same reads, k-mer for k-mer.

The 21 MB ``.pf`` is stored gzipped; ``EmphfPF.build_exact`` reproduces it
byte-for-byte from scratch (sha256 pinned below, full regeneration run in
test_emphf.py's exact-builder tests at small n and by
scripts/regen_golden13.py at full scale — ~3 min, kept out of the default
suite).
"""

import gzip
import hashlib
import os
import shutil

import numpy as np
import pytest

from aindex_tpu.constants import SPACE_13
from aindex_tpu.index.dense13 import Dense13Index
from aindex_tpu.index.emphf import EmphfPF, dense_slot_permutation

GOLD = os.path.join(os.path.dirname(__file__), "golden_ref")

#: sha256 of the raw reference-built artifacts (provenance pin)
PF_SHA256 = "105c51f9944afd30418d24958172af5a01592abc01b4d8cfafe610d96c2df137"
TF_SHA256 = "3cfae2b3a6f2854397b7065abdd3328c6b70c30732b866d86bcb3b9d52f40eea"
#: the seed compute_mphf_seq actually used = mt19937_64(37) draw 0
PF_SEED = 0xF9E51456553305F9


@pytest.fixture(scope="module")
def prefix13(tmp_path_factory):
    """Decompressed golden artifact set under a temp prefix 'p.13'."""
    d = tmp_path_factory.mktemp("gold13")
    for name in ("p.13.pf", "p.13.tf.bin", "p.13.indices.bin"):
        with gzip.open(os.path.join(GOLD, name + ".gz"), "rb") as f, \
                open(d / name, "wb") as out:
            shutil.copyfileobj(f, out)
    shutil.copy(os.path.join(GOLD, "p.13.index.bin"), d / "p.13.index.bin")
    shutil.copy(os.path.join(GOLD, "p.reads"), d / "p.reads")
    shutil.copy(os.path.join(GOLD, "p.ridx"), d / "p.ridx")
    return str(d / "p.13")


@pytest.fixture(scope="module")
def slot_perm(prefix13):
    pf = EmphfPF.load(prefix13 + ".pf")
    return pf, dense_slot_permutation(pf, 13)


def test_artifact_provenance(prefix13):
    h = hashlib.sha256(open(prefix13 + ".pf", "rb").read()).hexdigest()
    assert h == PF_SHA256
    h = hashlib.sha256(open(prefix13 + ".tf.bin", "rb").read()).hexdigest()
    assert h == TF_SHA256
    pf = EmphfPF.load(prefix13 + ".pf")
    assert pf.n == SPACE_13 and pf.seed == PF_SEED


def test_pf_lookup_is_perfect_on_sample(slot_perm):
    """Our Jenkins walk over the reference 13-mer hash: distinct codes map
    to distinct in-range slots (perfect-hash property, sampled)."""
    pf, perm = slot_perm
    rng = np.random.default_rng(13)
    codes = np.unique(rng.integers(0, SPACE_13, size=1 << 17).astype(np.uint64))
    slots = pf.lookup_codes(codes, 13)
    assert (slots >= 0).all() and (slots < SPACE_13).all()
    assert len(np.unique(slots)) == len(codes)
    # and the full permutation is a bijection
    assert perm.size == SPACE_13
    seen = np.zeros(SPACE_13, dtype=bool)
    seen[perm] = True
    assert seen.all()


def test_dense_load_rekeys_reference_table_bit_exactly(prefix13):
    """The re-keyed reference table must equal OUR dense count of the same
    reads exactly — pins count_kmers13 parity AND the slot->code unpermute
    (/root/reference/src/count_kmers13.cpp:358-388)."""
    loaded = Dense13Index.load(prefix13 + ".tf.bin", pf_path=prefix13 + ".pf")
    blob = np.fromfile(prefix13.replace("p.13", "p") + ".reads", np.uint8)
    ours = Dense13Index.build_from_blob(blob)
    np.testing.assert_array_equal(loaded.tf_host.astype(np.uint32),
                                  ours.tf_host)


def test_api_load_from_prefix_13mer_with_positions(prefix13):
    """Full facade load: queries + slot-rekeyed positional CSR + reads.

    NOTE on the positional artifacts: the reference's compute_aindex13 is
    genuinely broken by its uint width mismatch — it sizes the CSR from
    the tf file read at the wrong width
    (/root/reference/src/compute_aindex13.cpp:46-47: uint32 reads of
    count_kmers13's uint64 table), so the golden `.indices.bin` totals 146
    cells against a true occurrence count of 280 and every recorded
    position is the empty marker 0. The pin here is therefore (a) our
    loader represents that artifact faithfully (zeros are skipped per the
    reference query semantics, python_wrapper.cpp:800-822 — every
    position list is empty), and (b) OUR OWN 13-mer positional build over
    the same reads returns the correct position sets the reference tool
    failed to record."""
    from aindex_tpu import AIndex
    from aindex_tpu.index.positional import PositionalIndex
    ai = AIndex.load_from_prefix(prefix13, load_reads=True)
    reads_blob = open(os.path.join(GOLD, "p.reads")).read()

    # every 13-mer occurring in the reads: tf == occurrence count (fwd)
    occ = {}
    for i in range(len(reads_blob) - 12):
        km = reads_blob[i:i + 13]
        if set(km) <= set("ACGT"):
            occ.setdefault(km, []).append(i)
    kms = sorted(occ)
    tfs = ai.get_tf_values_13mer(kms)
    assert tfs == [len(occ[km]) for km in kms]
    assert len(kms) > 200

    # (a) faithful handling of the reference's broken positional artifact
    raw = np.fromfile(prefix13 + ".index.bin", np.uint64)
    assert raw.size == 146 and not raw.any()  # what the reference wrote
    assert all(len(ai.get_positions(km)) == 0 for km in kms[:20])

    # (b) our own build records what compute_aindex13 should have
    blob = np.frombuffer(reads_blob.encode(), np.uint8)
    pos = PositionalIndex.build_dense13(blob)
    from aindex_tpu.core import codec
    for km in kms:
        code = int(codec.encode_kmers([km], 13)[0][0])
        got = sorted(pos.positions_by_slot(code))
        assert got == occ[km], km

    # reads resolution against the shared p.reads/p.ridx
    rid, read = next(ai.iter_reads())
    assert rid == 0 and len(read) == 81
