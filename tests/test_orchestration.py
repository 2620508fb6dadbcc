"""Builders, clients (fake transports), prove wrappers, CLI smoke."""
import json
import os
import subprocess
import sys

from scroll_prover_tpu.orchestration import (
    BatchBuilder, ChunkBuilder, L2gethClient, RollupscanClient,
)
from scroll_prover_tpu.orchestration.prove_utils import mock_prove, prove_chunk
from scroll_prover_tpu.prover.chunk_info import ChunkInfo
from tests.test_witness_ccc import synthetic_trace


def test_chunk_builder_seals_on_overflow():
    cb = ChunkBuilder()
    # synthetic blocks are tiny; fill until one would overflow by faking a
    # massive block via many steps
    big = synthetic_trace(num_txs=2, num_logs=30)
    sealed = None
    for _ in range(50):
        sealed = cb.add(big)
        if sealed:
            break
    # tiny traces never overflow -> flush path
    rest = cb.flush()
    assert sealed or rest


def test_batch_builder_seals_on_count():
    bb = BatchBuilder()
    info = ChunkInfo(
        chain_id=1, prev_state_root="0x" + "00" * 32,
        post_state_root="0x" + "01" * 32, withdraw_root="0x" + "02" * 32,
        data_hash="0x" + "03" * 32, tx_bytes=b"x" * 10,
    )
    sealed = None
    for _ in range(46):
        sealed = bb.add(info)
        if sealed:
            break
    assert sealed is not None and len(sealed) == 45


def test_batch_builder_seals_on_blob_size():
    bb = BatchBuilder()
    # incompressible payloads (random bytes) ~ 30KB each -> blob fills fast
    sealed = None
    for i in range(10):
        info = ChunkInfo(
            chain_id=1, prev_state_root="0x" + "00" * 32,
            post_state_root="0x" + "01" * 32, withdraw_root="0x" + "02" * 32,
            data_hash="0x" + "03" * 32, tx_bytes=os.urandom(30_000),
        )
        sealed = bb.add(info)
        if sealed:
            break
    assert sealed is not None and 0 < len(sealed) < 10


def test_l2geth_client_fake_transport():
    trace_json = {
        "chainID": 5, "version": "t", "coinbase": {"address": "0x0"},
        "header": {"number": "0x10"}, "transactions": [],
        "storageTrace": {}, "executionResults": [],
    }

    def transport(payload):
        assert payload["method"] == "scroll_getBlockTraceByNumberOrHash"
        return {"jsonrpc": "2.0", "id": 1, "result": trace_json}

    c = L2gethClient("http://fake", transport=transport)
    t = c.get_block_trace_by_num(16)
    assert t.number == 16 and t.chain_id == 5


def test_l2geth_client_curie_override_param():
    """override_curie=True sends the chain-config override the reference
    sends (integration/src/l2geth.rs:43-62); default requests legacy
    storage-proof format."""
    trace_json = {
        "chainID": 5, "version": "t", "coinbase": {"address": "0x0"},
        "header": {"number": "0x10"}, "transactions": [],
        "storageTrace": {}, "executionResults": [],
    }
    seen = []

    def transport(payload):
        seen.append(payload["params"])
        return {"jsonrpc": "2.0", "id": 1, "result": trace_json}

    c = L2gethClient("http://fake", transport=transport)
    c.get_block_trace_by_num(16, override_curie=True)
    c.get_block_trace_by_num(16)
    assert seen[0] == ["0x10", {"overrides": {"curieBlock": 1}}]
    assert seen[1] == ["0x10", {"StorageProofFormat": "legacy"}]


def test_rollupscan_client_fake_transport():
    def transport(url):
        assert "batch_index=3" in url
        return {
            "batch_index": 3,
            "chunks": [
                {"index": 9, "start_block_number": 100, "end_block_number": 110}
            ],
        }

    c = RollupscanClient("http://fake", transport=transport)
    out = c.get_chunk_info_by_batch_index(3)
    assert out[0].index == 9 and out[0].end_block_number == 110


def test_prove_chunk_isolation_and_modes(monkeypatch):
    # CIRCUIT=none skips; CIRCUIT=ccc mock-proves; failures never raise
    monkeypatch.setenv("CIRCUIT", "none")
    assert prove_chunk({}, "", [synthetic_trace()]) is None
    monkeypatch.setenv("CIRCUIT", "ccc")
    assert prove_chunk({}, "", [synthetic_trace()]) is None
    monkeypatch.setenv("CIRCUIT", "real")
    assert prove_chunk({}, "", []) is None  # empty chunk -> isolated failure
    assert mock_prove([synthetic_trace()])


def test_chain_prover_block_mode_fake_client(tmp_path, monkeypatch):
    """Drive chain_prover's block loop end-to-end with a fake l2geth."""
    monkeypatch.setenv("CIRCUIT", "ccc")
    monkeypatch.setenv("SCROLL_PROVER_OUTPUT_DIR", str(tmp_path))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "bin"))
    import chain_prover as cp
    from scroll_prover_tpu.orchestration import Setting

    class FakeClient:
        def get_block_trace_by_num(self, n):
            return synthetic_trace()

    setting = Setting(
        l2geth_api_url="", rollupscan_api_url="", begin_batch=1, end_batch=1,
        begin_block=1, end_block=3, test_mode="block_prove",
        params_dir=str(tmp_path), assets_dir=str(tmp_path),
    )
    cp.prove_by_block(setting, FakeClient())
    cp.txtx_ccc(setting, FakeClient())


def test_trace_dumper_batch_layout(tmp_path):
    """scripts/trace_dumper.py writes the extra_traces/batch_*/chunk_*/
    block_*.json layout load_batch consumes, skips existing files on resume,
    and saves the raw node JSON verbatim (reference trace_dumper.py)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "trace_dumper",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "trace_dumper.py"),
    )
    td = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(td)

    trace_json = {
        "chainID": 5, "version": "t", "coinbase": {"address": "0x0"},
        "header": {"number": "0x10"}, "transactions": [],
        "storageTrace": {}, "executionResults": [],
    }
    calls = []

    def rpc_transport(payload):
        calls.append(payload["params"][0])
        return {"jsonrpc": "2.0", "id": 1, "result": trace_json}

    def scan_transport(url):
        return {
            "batch_index": 7,
            "chunks": [
                {"index": 1, "start_block_number": 100, "end_block_number": 101},
                {"index": 2, "start_block_number": 102, "end_block_number": 102},
            ],
        }

    l2geth = L2gethClient("http://fake", transport=rpc_transport)
    scan = RollupscanClient("http://fake", transport=scan_transport)
    res = td.dump_batch(l2geth, scan, 7, str(tmp_path))
    assert res == {1: 2, 2: 1}
    from scroll_prover_tpu.utils.test_util import load_batch

    chunks = load_batch(str(tmp_path / "batch_7"))
    assert [len(c) for c in chunks] == [2, 1]
    assert chunks[0][0].chain_id == 5
    # raw JSON persisted verbatim
    import json as _json

    with open(tmp_path / "batch_7" / "chunk_1" / "block_100.json") as fh:
        assert _json.load(fh) == trace_json
    # resume: second run fetches nothing
    assert td.dump_batch(l2geth, scan, 7, str(tmp_path)) == {1: 0, 2: 0}
    # only_chunk filter
    assert td.dump_batch(l2geth, scan, 7, str(tmp_path), only_chunk=2) == {2: 0}
