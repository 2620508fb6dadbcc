"""Signature witness: sighash RLP reconstruction + ECDSA recovery against
REAL fixture transactions — every recovered address must equal the trace's
`from` (reference scope: bus-mapping's tx signing-hash path + the sig
circuit's witness, SURVEY.md section 2.2)."""
import os

import pytest

from scroll_prover_tpu.curves import secp256k1 as secp
from scroll_prover_tpu.hashes.keccak import keccak256
from scroll_prover_tpu.utils import load_chunk
from scroll_prover_tpu.witness.sig import (
    rlp_encode, tx_sig_event, tx_sig_hash,
)

FIXTURES = "/root/reference/integration/tests/extra_traces"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not mounted"
)


def test_rlp_vectors():
    # canonical RLP test vectors
    assert rlp_encode(b"") == b"\x80"
    assert rlp_encode(0) == b"\x80"
    assert rlp_encode(b"\x00") == b"\x00"
    assert rlp_encode(15) == b"\x0f"
    assert rlp_encode(1024) == b"\x82\x04\x00"
    assert rlp_encode(b"dog") == b"\x83dog"
    assert rlp_encode([b"cat", b"dog"]) == b"\xc8\x83cat\x83dog"
    assert rlp_encode([]) == b"\xc0"
    assert rlp_encode(b"a" * 56) == b"\xb8\x38" + b"a" * 56


def test_secp256k1_basics():
    assert secp.is_on_curve(secp.G)
    assert secp.mul(secp.G, secp.N) is None
    q = secp.mul(secp.G, 123456789)
    assert secp.is_on_curve(q)
    # sign/verify/recover roundtrip
    z = int.from_bytes(keccak256(b"msg"), "big") % secp.N
    d, k = 0xDEAD1234, 0xBEEF5678
    r = secp.mul(secp.G, k)[0] % secp.N
    s = pow(k, -1, secp.N) * (z + r * d) % secp.N
    pub = secp.mul(secp.G, d)
    assert secp.ecdsa_verify(z, r, s, pub)
    assert not secp.ecdsa_verify(z, r, s + 1, pub)
    v = secp.mul(secp.G, k)[1] & 1
    assert secp.ecrecover(z, v, r, s) == pub


@pytest.mark.parametrize(
    "chunk", ["batch_300/chunk_12263", "batch_24/chunk_115", "batch_495/chunk_495"]
)
def test_fixture_signature_recovery(chunk):
    traces = load_chunk(os.path.join(FIXTURES, chunk))[:4]
    checked = 0
    for trace in traces:
        for tx in trace.transactions:
            if tx.is_l1_msg:
                continue
            ev = tx_sig_event(tx)
            assert ev is not None, f"unrecoverable signed tx {tx.tx_hash}"
            want = int(tx.from_addr, 16)
            assert ev.address == want, (
                f"sighash/recovery diverged for {tx.tx_hash}: "
                f"{hex(ev.address)} != {tx.from_addr}"
            )
            assert int.from_bytes(tx_sig_hash(tx), "big") == ev.msg_hash
            checked += 1
    assert checked > 0, "fixture had no signed txs"
