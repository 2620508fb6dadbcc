"""Blob-codec conformance against the reference's REAL compressed blob.

The scroll zstd fork's frame is standard zstd minus the 4-byte magic
(discovered round 5, pinned here): the envelope-0x01 blob in the
reference fixture `test_data/batch-task-with-blob.json` must decompress
through our codec and parse as the metadata||payload layout SURVEY §2.4
decodes — num_valid_chunks, 45 u32-be sizes, then the chunk payloads.
"""
import base64
import json
import os

import pytest

from scroll_prover_tpu.native.zstd_codec import (
    zstd_available,
    zstd_compress,
    zstd_decompress,
)

FIXTURE = "/root/reference/integration/tests/test_data/batch-task-with-blob.json"
MAX_AGG_SNARKS = 45

pytestmark = pytest.mark.skipif(
    not (os.path.exists(FIXTURE) and zstd_available()),
    reason="fixture or native zstd missing",
)


@pytest.fixture(scope="module")
def blob_bytes():
    with open(FIXTURE) as fh:
        return base64.b64decode(json.load(fh)["blob_bytes"])


def test_reference_zstd_blob_decodes(blob_bytes):
    assert blob_bytes[0] == 0x01  # zstd envelope
    batch = zstd_decompress(blob_bytes[1:])
    # metadata: u16_be count + 45 x u32_be sizes
    n = int.from_bytes(batch[:2], "big")
    assert 0 < n <= MAX_AGG_SNARKS
    sizes = [
        int.from_bytes(batch[2 + 4 * i : 6 + 4 * i], "big")
        for i in range(MAX_AGG_SNARKS)
    ]
    assert all(s == 0 for s in sizes[n:])  # padding chunks are empty
    meta_len = 2 + 4 * MAX_AGG_SNARKS
    assert meta_len + sum(sizes) == len(batch)


def test_reference_blob_via_decode_blob_bytes(blob_bytes):
    from scroll_prover_tpu.aggregator import decode_blob_bytes

    batch = decode_blob_bytes(blob_bytes)
    assert int.from_bytes(batch[:2], "big") > 0


def test_magicless_roundtrip():
    payload = b"scroll-prover-tpu" * 1000 + bytes(range(256))
    comp = zstd_compress(payload)
    # scroll convention: magic stripped
    assert comp[:4] != bytes.fromhex("28b52ffd")
    assert zstd_decompress(comp) == payload
    # full frames still decode
    assert zstd_decompress(zstd_compress(payload, strip_magic=False)) == payload
