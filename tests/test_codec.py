"""Unit tests for 2-bit codecs (host + device) — the analogue of the
reference's k-mer conversion tests (SURVEY.md §4, test_kmer_conversion.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from aindex_tpu.constants import K13, K23, SPACE_13
from aindex_tpu.core import codec
from aindex_tpu.kernels import encode as kenc

from oracle import rc as oracle_rc


def random_kmers(rng, k, n=256):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    mat = bases[rng.integers(0, 4, size=(n, k))]
    return [bytes(row).decode() for row in mat]


class TestHostCodec:
    def test_roundtrip_13(self, rng):
        kmers = random_kmers(rng, K13)
        codes, valid = codec.encode_kmers(kmers, K13)
        assert valid.all()
        assert (codes < SPACE_13).all()
        assert codec.decode_kmers(codes, K13) == kmers

    def test_roundtrip_23(self, rng):
        kmers = random_kmers(rng, K23)
        codes, valid = codec.encode_kmers(kmers, K23)
        assert valid.all()
        assert codec.decode_kmers(codes, K23) == kmers

    def test_code_order_matches_lexicographic(self):
        # A=00 < C=01 < G=10 < T=11 ⇒ integer order == string order
        kmers = sorted(["ATA", "AAT", "TAA", "CGC", "GGA", "ACT"])
        codes = [codec.encode_kmer(km) for km in kmers]
        assert codes == sorted(codes)

    def test_boundary_codes(self):
        assert codec.encode_kmer("A" * 13) == 0
        assert codec.encode_kmer("T" * 13) == SPACE_13 - 1
        assert codec.decode_kmer(0, 13) == "A" * 13
        assert codec.decode_kmer(SPACE_13 - 1, 13) == "T" * 13

    def test_invalid_bases_flagged(self):
        _, valid = codec.encode_kmers(["ACGTNACGTACGT", "A" * 13], 13)
        assert list(valid) == [False, True]

    @pytest.mark.parametrize("k", [13, 23])
    def test_revcomp_code_matches_string_revcomp(self, rng, k):
        kmers = random_kmers(rng, k)
        codes, _ = codec.encode_kmers(kmers, k)
        rc_codes = codec.revcomp_code(codes, k)
        assert codec.decode_kmers(rc_codes, k) == [oracle_rc(km) for km in kmers]

    def test_revcomp_string(self):
        assert codec.revcomp("ACGTN") == "NACGT"
        assert codec.revcomp("AAA~TTT") == "AAA~TTT"

    def test_canonical_is_min(self, rng):
        kmers = random_kmers(rng, K23)
        codes, _ = codec.encode_kmers(kmers, K23)
        canon = codec.canonical_code(codes, K23)
        for km, c in zip(kmers, canon):
            assert codec.decode_kmer(int(c), K23) == min(km, oracle_rc(km))

    def test_hamming(self):
        assert codec.hamming_distance("ACGT", "ACGA") == 1
        assert codec.hamming_distance("NCGT", "ACGT") == 0


class TestDeviceCodec:
    def test_ascii_lut(self):
        arr = np.frombuffer(b"ACGTacgtNX\n~", dtype=np.uint8)
        out = np.asarray(kenc.ascii_to_base_codes(jnp.asarray(arr)))
        assert list(out[:8]) == [0, 1, 2, 3, 0, 1, 2, 3]
        assert (out[8:] >= 4).all()

    def test_window_codes_match_host(self, rng):
        seq = "".join(np.random.default_rng(3).choice(list("ACGT"), 100))
        arr = np.frombuffer(seq.encode(), dtype=np.uint8)
        codes, valid = kenc.window_codes(
            kenc.ascii_to_base_codes(jnp.asarray(arr)), 13)
        assert np.asarray(valid).all()
        expected = [codec.encode_kmer(seq[i:i + 13]) for i in range(len(seq) - 12)]
        assert list(np.asarray(codes)) == expected

    def test_window_validity_masks_bad_bases(self):
        seq = "ACGTACGTACGTAN" + "ACGTACGTACGTT"
        arr = np.frombuffer(seq.encode(), dtype=np.uint8)
        _, valid = kenc.window_codes(
            kenc.ascii_to_base_codes(jnp.asarray(arr)), 13)
        valid = np.asarray(valid)
        # windows overlapping index 13 ('N') must be invalid
        for i in range(len(valid)):
            overlaps_n = i <= 13 < i + 13
            assert valid[i] == (not overlaps_n)

    @pytest.mark.parametrize("k,fn,dtype", [
        (13, kenc.revcomp_code13, jnp.uint32),
        (23, kenc.revcomp_code64, jnp.uint64),
    ])
    def test_device_revcomp_matches_host(self, rng, k, fn, dtype):
        kmers = random_kmers(rng, k, 64)
        codes, _ = codec.encode_kmers(kmers, k)
        dev = np.asarray(fn(jnp.asarray(codes.astype(np.uint64)).astype(dtype), k))
        host = codec.revcomp_code(codes, k)
        assert (dev.astype(np.uint64) == host).all()


class TestPackedIngest:
    """The packed device-ingest wire format (pack_ascii_chunk <->
    kernels.encode.unpack_base_codes)."""

    def _random_ascii(self, rng, n):
        pool = np.frombuffer(b"ACGTacgtN\n~X", dtype=np.uint8)
        return pool[rng.integers(0, len(pool), size=n)]

    def test_pack_unpack_roundtrip(self, rng):
        from aindex_tpu.core.codec import pack_ascii_chunk
        from aindex_tpu.kernels import encode as kenc
        import jax.numpy as jnp
        chunk = self._random_ascii(rng, 2048)
        packed, vbits = pack_ascii_chunk(chunk)
        assert packed.dtype == np.uint32 and packed.size == 128
        assert vbits.dtype == np.uint8 and vbits.size == 256
        base = np.asarray(kenc.unpack_base_codes(
            jnp.asarray(packed), jnp.asarray(vbits)))
        expect = np.asarray(kenc.ascii_to_base_codes(jnp.asarray(chunk)))
        np.testing.assert_array_equal(base, expect)

    def test_pack_pads_unaligned(self, rng):
        from aindex_tpu.core.codec import pack_ascii_chunk
        chunk = self._random_ascii(rng, 150)  # not a multiple of 16
        packed, vbits = pack_ascii_chunk(chunk)
        assert packed.size == 10 and vbits.size == 20
        # the 10 pad positions must be invalid
        bits = np.unpackbits(vbits, bitorder="little")
        assert not bits[150:].any()

    def test_pack_batched_rows(self, rng):
        from aindex_tpu.core.codec import pack_ascii_chunk
        from aindex_tpu.kernels import encode as kenc
        import jax.numpy as jnp
        mat = self._random_ascii(rng, 4 * 256).reshape(4, 256)
        packed, vbits = pack_ascii_chunk(mat)
        assert packed.shape == (4, 16) and vbits.shape == (4, 32)
        base = np.asarray(kenc.unpack_base_codes(
            jnp.asarray(packed), jnp.asarray(vbits)))
        expect = np.asarray(kenc.ascii_to_base_codes(jnp.asarray(mat)))
        np.testing.assert_array_equal(base, expect)

    def test_packed_count_matches_ascii(self, rng):
        import jax.numpy as jnp
        from aindex_tpu.core.codec import pack_ascii_chunk
        from aindex_tpu.kernels.count import (count_batch_13,
                                              count_batch_13_packed)
        from aindex_tpu.kernels.count import zeros_dev
        from aindex_tpu.constants import SPACE_13
        chunk = self._random_ascii(rng, 4096)
        a = count_batch_13(zeros_dev((SPACE_13,), jnp.uint32),
                           jnp.asarray(chunk))
        packed, vbits = pack_ascii_chunk(chunk)
        b = count_batch_13_packed(zeros_dev((SPACE_13,), jnp.uint32),
                                  jnp.asarray(packed), jnp.asarray(vbits))
        assert int(jnp.sum(a != b)) == 0

    def test_packed_spectrum_matches_ascii(self, rng):
        import jax.numpy as jnp
        from aindex_tpu.core.codec import pack_ascii_chunk
        from aindex_tpu.kernels.spectrum import (chunk_spectrum,
                                                 chunk_spectrum_packed)
        chunk = self._random_ascii(rng, 4096)
        k1, c1, n1 = chunk_spectrum(jnp.asarray(chunk), 23)
        packed, vbits = pack_ascii_chunk(chunk)
        k2, c2, n2 = chunk_spectrum_packed(jnp.asarray(packed),
                                           jnp.asarray(vbits), 23)
        n1, n2 = int(n1), int(n2)
        assert n1 == n2
        np.testing.assert_array_equal(np.asarray(k1)[:n1], np.asarray(k2)[:n2])
        np.testing.assert_array_equal(np.asarray(c1)[:n1], np.asarray(c2)[:n2])
