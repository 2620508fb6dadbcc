"""Step-traced zstd decoder (aggregator/zstd_decoder.py): the groundwork
for in-circuit blob decompression (VERDICT round-4 #10).

The decoder must byte-exactly reproduce libzstd's output on (a) frames
our own pinned encoder emits and (b) the reference's REAL released blob
(scroll-fork format = standard zstd minus the magic), while emitting a
lookup-table-shaped step trace — lit/match/fse/huff rows — that a
circuit decoder would consume as its witness."""
import base64
import json
import os

import pytest

from scroll_prover_tpu.aggregator.zstd_decoder import decode_frame
from scroll_prover_tpu.native.zstd_codec import (
    zstd_available,
    zstd_compress,
    zstd_decompress,
)

FIXTURE = "/root/reference/integration/tests/test_data/batch-task-with-blob.json"

pytestmark = pytest.mark.skipif(
    not zstd_available(), reason="native zstd missing"
)


def test_roundtrip_own_encoder():
    payload = b"scroll-prover-tpu " * 500 + bytes(range(256)) * 3
    r = decode_frame(zstd_compress(payload))
    assert r.data == payload
    # trace replays to the same output: lit/match rows alone rebuild it
    out = bytearray()
    for step in r.trace:
        if step[0] == "lit":
            assert step[1] == len(out)
            out.append(step[2])
        elif step[0] == "match":
            _, dst, offset, length = step
            assert dst == len(out) and offset <= len(out)
            for _ in range(length):
                out.append(out[len(out) - offset])
    assert bytes(out) == payload


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture missing")
def test_reference_blob_byte_exact():
    with open(FIXTURE) as fh:
        bb = base64.b64decode(json.load(fh)["blob_bytes"])
    assert bb[0] == 0x01
    want = zstd_decompress(bb[1:])
    r = decode_frame(bb[1:])
    assert r.data == want  # byte-for-byte vs libzstd on the REAL blob
    assert r.blocks >= 1
    kinds = {s[0] for s in r.trace}
    assert "lit" in kinds and "match" in kinds and "fse" in kinds


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture missing")
def test_reference_blob_trace_replays():
    with open(FIXTURE) as fh:
        bb = base64.b64decode(json.load(fh)["blob_bytes"])
    want = zstd_decompress(bb[1:])
    r = decode_frame(bb[1:])
    out = bytearray()
    for step in r.trace:
        if step[0] == "lit":
            out.append(step[2])
        elif step[0] == "match":
            _, _dst, offset, length = step
            for _ in range(length):
                out.append(out[len(out) - offset])
    assert bytes(out) == want


def test_incompressible_raw_block():
    import os as _os

    payload = _os.urandom(4096)  # forces a raw block
    r = decode_frame(zstd_compress(payload))
    assert r.data == payload
