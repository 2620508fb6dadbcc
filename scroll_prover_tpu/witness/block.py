"""WitnessBlock: the aggregated per-chunk witness tables.

A deterministic reduction of one-or-more BlockTraces into the quantities the
subcircuits assign from (step list, rw ops, bytecode table, keccak inputs,
copy bytes, precompile counts, state accesses). Functional mirror of
`chunk_trace_to_witness_block` (reference integration/src/mock.rs:12; the
bus-mapping CircuitInputBuilder replay, SURVEY.md section 2.2) scoped to the
statistics + tables our subcircuits consume.
"""
from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from ..hashes.keccak import keccak256
from ..l2types.block_trace import BlockTrace

# opcodes whose dynamic gas is copy traffic (3 gas/word); CALL/CREATE gas
# is dominated by stipends/account charges, so they are excluded here
_COPY_OPS = {
    "CALLDATACOPY", "CODECOPY", "EXTCODECOPY", "RETURNDATACOPY", "MCOPY",
    "RETURN", "REVERT", "LOG0", "LOG1", "LOG2", "LOG3", "LOG4", "SHA3",
}
_STORAGE_OPS = {"SLOAD": 2, "SSTORE": 4, "TLOAD": 2, "TSTORE": 4}
_CALL_OPS = {"CALL", "CALLCODE", "DELEGATECALL", "STATICCALL", "CREATE", "CREATE2"}
_PRECOMPILES = {
    1: "ecrecover", 2: "sha256", 3: "ripemd", 4: "identity",
    5: "modexp", 6: "ecadd", 7: "ecmul", 8: "ecpairing", 9: "blake2f",
}


@dataclass
class StepWitness:
    op: str
    pc: int
    gas_cost: int
    depth: int
    tx_index: int


@dataclass
class WitnessBlock:
    chain_id: int = 0
    block_numbers: list[int] = field(default_factory=list)
    start_l1_queue_index: int = 0
    prev_state_root: str = "0x" + "00" * 32
    post_state_root: str = "0x" + "00" * 32
    withdraw_root: str = "0x" + "00" * 32
    coinbase: str = ""
    timestamps: list[int] = field(default_factory=list)

    steps: list[StepWitness] = field(default_factory=list)
    num_txs: int = 0
    num_l1_msgs: int = 0
    total_gas: int = 0
    tx_data_lens: list[int] = field(default_factory=list)
    tx_bytes: bytes = b""

    rw_ops: int = 0
    copy_bytes: int = 0
    keccak_inputs: list[bytes] = field(default_factory=list)
    sha256_bytes: int = 0
    exp_events: int = 0
    modexp_events: int = 0
    sig_count: int = 0
    ecc_ops: Counter = field(default_factory=Counter)
    precompile_calls: Counter = field(default_factory=Counter)
    bytecodes: dict[str, int] = field(default_factory=dict)  # hash -> len
    state_accesses: int = 0
    mpt_nodes: int = 0

    @property
    def num_steps(self) -> int:
        return len(self.steps)

    def data_hash_preimage(self) -> bytes:
        """Chunk data-hash preimage (block numbers + tx hashes flattened)."""
        out = bytearray()
        for n in self.block_numbers:
            out += n.to_bytes(8, "big")
        out += self.tx_bytes[:1024]
        return bytes(out)

    def data_hash(self) -> bytes:
        return keccak256(self.data_hash_preimage())


def chunk_trace_to_witness_block(traces: list[BlockTrace]) -> WitnessBlock:
    assert traces, "empty chunk"
    wb = WitnessBlock(
        chain_id=traces[0].chain_id,
        start_l1_queue_index=traces[0].start_l1_queue_index,
        prev_state_root=traces[0].state_root_before,
        post_state_root=traces[-1].state_root_after,
        withdraw_root=traces[-1].withdraw_trie_root,
        coinbase=traces[0].coinbase.address,
    )
    for trace in traces:
        _absorb_block(wb, trace)
    return wb


def _absorb_block(wb: WitnessBlock, trace: BlockTrace) -> None:
    wb.block_numbers.append(trace.number)
    wb.timestamps.append(trace.timestamp)
    wb.total_gas += trace.gas_used
    tx_bytes = bytearray(wb.tx_bytes)

    for ti, tx in enumerate(trace.transactions):
        wb.num_txs += 1
        if tx.is_l1_msg:
            wb.num_l1_msgs += 1
        else:
            wb.sig_count += 1  # ECDSA recovery per L2 tx
        data = tx.call_data
        wb.tx_data_lens.append(len(data))
        tx_bytes += data
        wb.keccak_inputs.append(data[:136] if data else b"")
        # state touch for from/to accounts
        wb.rw_ops += 8
        wb.state_accesses += 2

        er = (
            trace.execution_results[ti]
            if ti < len(trace.execution_results)
            else None
        )
        if er is None:
            continue
        if er.byte_code:
            code = bytes.fromhex(er.byte_code[2:]) if er.byte_code.startswith("0x") else b""
            h = keccak256(code).hex()
            wb.bytecodes.setdefault(h, len(code))
        for sl in er.struct_logs:
            wb.steps.append(
                StepWitness(sl.op, sl.pc, sl.gas_cost, sl.depth, wb.num_txs - 1)
            )
            op = sl.op
            wb.rw_ops += _rw_of(op)
            if op in _COPY_OPS:
                if op.startswith("LOG"):
                    # LOG: 375*(topics+1) static + 8 gas/byte
                    topics = int(op[3:])
                    dyn = max(sl.gas_cost - 375 * (topics + 1), 0)
                    wb.copy_bytes += dyn // 8
                else:
                    # copy family: 3 gas/word (memory expansion over-counts
                    # slightly, which keeps the estimate an upper bound)
                    wb.copy_bytes += min(max(sl.gas_cost, 3) // 3, 65536) * 32
            if op == "SHA3":
                wb.keccak_inputs.append(b"\x00" * min(sl.gas_cost, 136))
            if op == "EXP":
                wb.exp_events += 1
            if op in _CALL_OPS:
                to = (sl.extra or {}).get("stack", None)
                wb.rw_ops += 12
        # precompile calls from the call trace
        _walk_calls(wb, er.call_trace)

    # storage proofs -> mpt/state accounting; per-tx storage traces are
    # preferred so the incremental (per-tx) CCC path sums to the same count
    sts = trace.tx_storage_traces or [trace.storage_trace]
    for st in sts:
        for addr, proof in (st.proofs or {}).items():
            wb.mpt_nodes += len(proof)
            wb.state_accesses += 1
        for addr, slots in (st.storage_proofs or {}).items():
            for slot, proof in slots.items():
                wb.mpt_nodes += len(proof)
                wb.state_accesses += 1
    wb.tx_bytes = bytes(tx_bytes)


def _rw_of(op: str) -> int:
    if op in _STORAGE_OPS:
        return _STORAGE_OPS[op]
    if op.startswith("DUP") or op.startswith("SWAP"):
        return 2
    if op.startswith("PUSH") or op.startswith("LOG"):
        return 1
    if op in ("MLOAD", "MSTORE", "MSTORE8"):
        return 3
    return 2


def _walk_calls(wb: WitnessBlock, call: dict) -> None:
    if not call:
        return
    to = call.get("to") or ""
    if to.startswith("0x") and len(to) == 42:
        try:
            addr = int(to, 16)
        except ValueError:
            addr = -1
        if 1 <= addr <= 9:
            name = _PRECOMPILES[addr]
            wb.precompile_calls[name] += 1
            if name == "sha256":
                wb.sha256_bytes += len(call.get("input", "0x")) // 2
            elif name == "modexp":
                wb.modexp_events += 1
            elif name in ("ecadd", "ecmul", "ecpairing"):
                wb.ecc_ops[name] += 1
            elif name == "ecrecover":
                wb.sig_count += 1
    for sub in call.get("calls") or []:
        _walk_calls(wb, sub)
