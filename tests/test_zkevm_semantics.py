"""zkEVM subcircuit semantics on the REAL reference fixture
(/root/reference/integration/tests/extra_traces/batch_3/chunk_10):

VERDICT round-2 item 4 'Done' criteria — MockProver must reject
  (a) a witness with a flipped bytecode byte (evm<->bytecode lookup), and
  (b) a stale state read (rw-table read-consistency gate)
on fixture-derived witnesses. Plus positive checks: real code bytes in the
bytecode table, real keccak digests (trace keccakCodeHash equality), and
real rw values chaining across the chunk's transactions.
"""
import os

import pytest

from scroll_prover_tpu.fields.bn254 import FR_MOD
from scroll_prover_tpu.hashes.keccak import keccak256
from scroll_prover_tpu.proof_system.plonk import MockProver
from scroll_prover_tpu.utils import load_chunk
from scroll_prover_tpu.witness.block import TAG_BALANCE, chunk_trace_to_witness_block
from scroll_prover_tpu.zkevm.super_circuit import ScrollSuperCircuit

REF_CHUNK = "/root/reference/integration/tests/extra_traces/batch_3/chunk_10"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CHUNK), reason="reference fixtures not mounted"
)


@pytest.fixture(scope="module")
def wb():
    # two blocks keep the MockProver domain small while still exercising
    # cross-tx rw chaining (the coinbase balance changes every block)
    traces = load_chunk(REF_CHUNK)[:2]
    return chunk_trace_to_witness_block(traces)


@pytest.fixture(scope="module")
def mock(wb):
    circ = ScrollSuperCircuit.new_from_block(wb)
    k = circ.min_k()
    mp = MockProver.run(k, circ, circ.instance_for())
    return circ, mp


def test_witness_has_real_tables(wb):
    assert wb.bytecode_map, "no real bytecode extracted"
    for h, code in wb.bytecode_map.items():
        assert keccak256(code).hex() == h  # real bytes under the real hash
    assert wb.keccak_events
    for ev in wb.keccak_events:
        assert keccak256(ev.preimage) == ev.digest
    assert wb.rw_rows
    assert any(r.is_write for r in wb.rw_rows)
    assert any(not r.is_write for r in wb.rw_rows)
    # cross-tx chaining: at least one key group has multiple rows
    from collections import Counter

    groups = Counter((r.tag, r.addr, r.key) for r in wb.rw_rows)
    assert max(groups.values()) >= 2


def test_fixture_mock_prove_satisfied(mock):
    _circ, mp = mock
    failures = mp.verify()
    assert failures == [], [str(f) for f in failures[:5]]


def test_flipped_bytecode_byte_rejected(mock, wb):
    circ, mp = mock
    col = mp.advice[circ.bytecode.byte.index]
    # flip a byte that some executed step actually looked up: row of the
    # bytecode region holding (code, pc) of the first top-frame step
    step = next(s for s in wb.steps if s.code_hash)
    target = None
    hi_col = mp.advice[circ.bytecode.hash_hi.index]
    idx_col = mp.advice[circ.bytecode.index.index]
    want_hi = step.code_hash >> 128
    for r in range(mp.n):
        if hi_col[r] == want_hi and idx_col[r] == step.pc:
            target = r
            break
    assert target is not None
    old = col[target]
    col[target] = (old + 1) % 256
    try:
        failures = mp.verify()
        assert failures, "flipped bytecode byte must be rejected"
        assert any("bytecode" in str(f) or "lookup" in str(f) for f in failures)
    finally:
        col[target] = old


def test_stale_state_read_rejected(mock, wb):
    circ, mp = mock
    # find an assigned read row whose key group has a previous row (same==1)
    same_col = mp.advice[circ.state.same.index]
    isw_col = mp.advice[circ.state.is_write.index]
    vlo_col = mp.advice[circ.state.v_lo.index]
    target = None
    for r in range(mp.n):
        if same_col[r] == 1 and isw_col[r] == 0:
            target = r
            break
    assert target is not None, "no chained read row found"
    old = vlo_col[target]
    vlo_col[target] = (int(old) + 1) % FR_MOD
    try:
        failures = mp.verify()
        assert failures, "stale state read must be rejected"
        assert any("state/read_consistent" in str(f) for f in failures)
    finally:
        vlo_col[target] = old


def test_tampered_copied_byte_rejected(mock):
    circ, mp = mock
    # flip a transported byte on a CODE-sourced copy row: the copy->bytecode
    # lookup must fail (the copy circuit moves the REAL code bytes)
    q_col = mp.fixed[circ.copy.q_code.index]
    byte_col = mp.advice[circ.copy.byte.index]
    target = next(r for r in range(mp.n) if q_col[r] == 1)
    old = byte_col[target]
    byte_col[target] = (int(old) + 1) % 256
    try:
        failures = mp.verify()
        assert failures, "tampered copied byte must be rejected"
        assert any("copy" in str(f) for f in failures)
    finally:
        byte_col[target] = old


def test_copy_calldata_length_binding(mock):
    circ, mp = mock
    # a calldata copy event's declared length must match the tx table row
    q_col = mp.fixed[circ.copy.q_first_cd.index]
    len_col = mp.advice[circ.copy.len.index]
    target = next((r for r in range(mp.n) if q_col[r] == 1), None)
    if target is None:
        pytest.skip("fixture blocks carry no nonempty calldata")
    old = len_col[target]
    len_col[target] = int(old) + 1
    try:
        failures = mp.verify()
        assert failures, "calldata length mismatch must be rejected"
        assert any("copy/tx_len" in str(f) or "lookup" in str(f) for f in failures)
    finally:
        len_col[target] = old


def test_tampered_keccak_digest_rejected(mock):
    circ, mp = mock
    # flipping a keccak-table digest breaks the bytecode->keccak lookup
    hi_col = mp.advice[circ.keccak.hash_hi.index]
    q_col = mp.fixed[circ.keccak.q.index]
    target = next(r for r in range(mp.n) if q_col[r] == 1)
    old = hi_col[target]
    hi_col[target] = (int(old) + 1) % FR_MOD
    try:
        failures = mp.verify()
        assert failures, "tampered keccak digest must be rejected"
    finally:
        hi_col[target] = old


# --- in-circuit opcode semantics (VERDICT round-3 item 4) -------------------


def _sem_steps(wb):
    return [s for s in wb.steps if s.sp >= 0]


def test_stack_rw_rows_recorded(wb):
    from scroll_prover_tpu.witness.block import TAG_STACK

    steps = _sem_steps(wb)
    assert steps, "replay produced no semantics-backed steps"
    stack_rows = [r for r in wb.rw_rows if r.tag == TAG_STACK]
    assert stack_rows, "no stack rw rows emitted"
    # every recorded step op maps to contiguous rows at its rwc base
    for s in steps:
        if not s.stack_ops:
            continue
        for i, (slot, value, is_write) in enumerate(s.stack_ops):
            row = wb.rw_rows[s.stack_rwc0 - 1 + i]
            assert row.tag == TAG_STACK
            assert row.rwc == s.stack_rwc0 + i
            assert row.key == slot and row.value == value
            assert row.is_write == is_write


def test_mock_accepts_semantics(mock):
    _circ, mp = mock
    assert mp.verify_par() == []


def test_tampered_add_result_rejected(wb):
    """Flip one bit of an ADD result in BOTH the stack rw row and the
    step's operand copy: the carry-constrained add gate must fail (the
    value is no longer a+b), even though the rw table stays internally
    consistent."""
    import copy

    from scroll_prover_tpu.witness.block import TAG_STACK

    target = None
    for s in wb.steps:
        if s.sp >= 0 and s.op_byte == 0x01 and len(s.stack_ops) >= 3:
            target = s
            break
    if target is None:
        pytest.skip("fixture slice executes no ADD")
    wb2 = copy.deepcopy(wb)
    for s in wb2.steps:
        if (
            s.sp >= 0
            and s.stack_rwc0 == target.stack_rwc0
        ):
            slot, value, w = s.stack_ops[2]
            bad = value ^ 1
            s.stack_ops = (s.stack_ops[0], s.stack_ops[1], (slot, bad, w))
            row = wb2.rw_rows[s.stack_rwc0 - 1 + 2]
            assert row.tag == TAG_STACK and row.is_write
            row.value = bad
            break
    circ = ScrollSuperCircuit.new_from_block(wb2)
    mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    fails = mp.verify_par()
    assert any("add" in str(f) or "consistent" in str(f) for f in fails), (
        fails[:5] or "tampered ADD result accepted"
    )


def test_tampered_stack_read_rejected(wb):
    """Corrupt a stack READ row's value (leaving the step cells alone):
    either the read-consistency gate or a semantic rw lookup must fail."""
    import copy

    from scroll_prover_tpu.witness.block import TAG_STACK

    wb2 = copy.deepcopy(wb)
    victim = None
    for r in wb2.rw_rows:
        if r.tag == TAG_STACK and not r.is_write:
            victim = r
            break
    if victim is None:
        pytest.skip("no stack reads in fixture slice")
    victim.value ^= 1
    circ = ScrollSuperCircuit.new_from_block(wb2)
    mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    assert mp.verify_par() != [], "tampered stack read accepted"


# ---- rw-table sort-order soundness (ADVICE round-4 medium) -----------------
# These emulate the BEST-EFFORT adversary: not just perturbing an honest
# witness, but also repairing every helper column the attacker controls —
# the remaining failures are the ordering constraints themselves biting.


def _set_lex_helpers(circ, mp, r, dval):
    """Adversary repairs dcol/dbytes at row r for claimed first-diff dval
    (mod p). Returns the previous values for restore."""
    st = circ.state
    old = [int(mp.advice[st.dcol.index][r])] + [
        int(mp.advice[b.index][r]) for b in st.dbytes
    ]
    dm1 = (dval - 1) % FR_MOD
    mp.advice[st.dcol.index][r] = dm1
    rem = dm1
    for b in st.dbytes:
        mp.advice[b.index][r] = rem & 0xFF
        rem >>= 8
    return old


def _restore_lex_helpers(circ, mp, r, old):
    st = circ.state
    mp.advice[st.dcol.index][r] = old[0]
    for b, v in zip(st.dbytes, old[1:]):
        mp.advice[b.index][r] = v


def test_swapped_rwc_within_group_rejected(mock):
    """Swapping two in-group rwc values reverses the order the
    read-consistency chain relies on; the lex gate's range check must
    reject it for EVERY helper assignment the adversary can choose."""
    circ, mp = mock
    st = circ.state
    same_col = mp.advice[st.same.index]
    rwc_col = mp.advice[st.rwc.index]
    sel_col = mp.fixed[st.sel.index]
    target = next(r for r in range(mp.n) if same_col[r] == 1 and sel_col[r] == 1)
    ra, rb = target - 1, target
    old_a, old_b = int(rwc_col[ra]), int(rwc_col[rb])
    rwc_col[ra], rwc_col[rb] = old_b, old_a
    # adversary repairs the first-diff witness at rb (now negative diff)
    # and at rb+1 if it chains
    repaired = [(rb, _set_lex_helpers(circ, mp, rb, (old_a - old_b) % FR_MOD))]
    try:
        failures = mp.verify()
        assert failures, "reversed in-group rwc order must be rejected"
        assert any("state/lex" in str(f) for f in failures)
    finally:
        rwc_col[ra], rwc_col[rb] = old_a, old_b
        for r, old in repaired:
            _restore_lex_helpers(circ, mp, r, old)


def test_duplicate_rwc_rejected(mock):
    """Re-pointing a row's rwc at another row's value (the injection
    primitive: a shadow write justified at a chosen counter) breaks the
    ctr <-> rwc bijection lookups."""
    circ, mp = mock
    st = circ.state
    q_col = mp.fixed[st.q.index]
    rwc_col = mp.advice[st.rwc.index]
    rows = [r for r in range(mp.n) if q_col[r] == 1]
    assert len(rows) >= 2
    ra, rb = rows[0], rows[-1]
    old = int(rwc_col[rb])
    rwc_col[rb] = int(rwc_col[ra])  # duplicate counter value
    # repair the lex witness on rb and its successor as best as possible
    repaired = []
    sel_col = mp.fixed[st.sel.index]
    same_col = mp.advice[st.same.index]
    if sel_col[rb] == 1 and same_col[rb] == 1:
        prev = int(rwc_col[rb - 1])
        repaired.append((rb, _set_lex_helpers(circ, mp, rb, (int(rwc_col[rb]) - prev) % FR_MOD)))
    try:
        failures = mp.verify()
        assert failures, "duplicated rwc must be rejected"
        assert any("state/rwc_" in str(f) or "state/lex" in str(f) for f in failures)
    finally:
        rwc_col[rb] = old
        for r, o in repaired:
            _restore_lex_helpers(circ, mp, r, o)


def test_group_split_rejected(mock):
    """Moving a row out of its key group (changing addr so the group is
    no longer contiguous) must fail even when the adversary repairs every
    eq/inv/prefix/lex helper on the affected boundaries."""
    circ, mp = mock
    st = circ.state
    same_col = mp.advice[st.same.index]
    sel_col = mp.fixed[st.sel.index]
    addr_col = mp.advice[st.addr.index]
    # find a row inside a group (same==1) whose successor is also in-region
    target = next(
        r for r in range(mp.n - 1)
        if same_col[r] == 1 and sel_col[r] == 1 and sel_col[r + 1] == 1
    )
    old_addr = int(addr_col[target])
    addr_col[target] = old_addr + (1 << 100)  # tear it out of the group
    saved = {}
    for rr in (target, target + 1):
        # adversary recomputes eq flags, inverses, prefix products, same,
        # and the lex witness for the new (claimed) ordering
        cur = [int(mp.advice[c.index][rr]) for c in (st.tag, st.addr, st.key_hi, st.key_lo)]
        prv = [int(mp.advice[c.index][rr - 1]) for c in (st.tag, st.addr, st.key_hi, st.key_lo)]
        saved[rr] = (
            [int(mp.advice[st.eq[f].index][rr]) for f in range(4)],
            [int(mp.advice[st.inv[f].index][rr]) for f in range(4)],
            int(mp.advice[st.same.index][rr]),
            int(mp.advice[st.p01.index][rr]),
            int(mp.advice[st.p012.index][rr]),
        )
        eqs = []
        for f in range(4):
            d = (cur[f] - prv[f]) % FR_MOD
            eqs.append(1 if d == 0 else 0)
            mp.advice[st.eq[f].index][rr] = eqs[f]
            mp.advice[st.inv[f].index][rr] = pow(d, -1, FR_MOD) if d else 0
        mp.advice[st.same.index][rr] = int(all(eqs))
        mp.advice[st.p01.index][rr] = eqs[0] * eqs[1]
        mp.advice[st.p012.index][rr] = eqs[0] * eqs[1] * eqs[2]
        dval = None
        for f in range(4):
            if not eqs[f]:
                dval = (cur[f] - prv[f]) % FR_MOD
                break
        if dval is None:
            dval = (int(mp.advice[st.rwc.index][rr]) - int(mp.advice[st.rwc.index][rr - 1])) % FR_MOD
        saved[rr] = saved[rr] + (_set_lex_helpers(circ, mp, rr, dval),)
    try:
        failures = mp.verify()
        assert failures, "group-splitting addr change must be rejected"
        # the backwards boundary (target+1 returns to the old addr) has a
        # negative first-diff => no valid byte decomposition
        assert any("state/lex" in str(f) for f in failures)
    finally:
        addr_col[target] = old_addr
        for rr, (eqs, invs, sm, p01, p012, lex_old) in saved.items():
            for f in range(4):
                mp.advice[st.eq[f].index][rr] = eqs[f]
                mp.advice[st.inv[f].index][rr] = invs[f]
            mp.advice[st.same.index][rr] = sm
            mp.advice[st.p01.index][rr] = p01
            mp.advice[st.p012.index][rr] = p012
            _restore_lex_helpers(circ, mp, rr, lex_old)


# ---- PUSH immediate binding (VERDICT round-4 #6) ---------------------------


def test_push_immediate_bound_to_code(mock):
    """Changing the value a PUSH-k step claims to push (while repairing
    the rw row it writes) must break the evm/push_immediate lookup: the
    pushed word is pinned to the accumulated immediate bytes at
    (code_hash, pc + k) in the bytecode table."""
    circ, mp = mock
    ev = circ.evm
    qsem = mp.fixed[ev.q_sem.index]
    qcode = mp.fixed[ev.q_code.index]
    fimm = mp.advice[ev.f_imm.index]
    target = next(
        (
            r
            for r in range(mp.n)
            if qsem[r] == 1 and qcode[r] == 1 and fimm[r] == 1
        ),
        None,
    )
    if target is None:
        pytest.skip("no immediate PUSH among replayed steps")
    clo = mp.advice[ev.c_lo.index]
    old = int(clo[target])
    clo[target] = (old + 1) % FR_MOD
    # adversary also repairs the stack rw write row for the new value:
    # find the TAG_STACK row at (rwc, slot) this step writes
    st = circ.state
    rwc0 = int(mp.advice[ev.rwc.index][target])
    q_col = mp.fixed[st.q.index]
    fixed_row = None
    for r in range(mp.n):
        if q_col[r] == 1 and int(mp.advice[st.rwc.index][r]) == rwc0:
            fixed_row = r
            break
    saved_state = None
    if fixed_row is not None:
        saved_state = int(mp.advice[st.v_lo.index][fixed_row])
        mp.advice[st.v_lo.index][fixed_row] = (old + 1) % FR_MOD
    try:
        failures = mp.verify()
        assert failures, "tampered push value must be rejected"
        assert any("push_immediate" in str(f) or "state/" in str(f) for f in failures)
    finally:
        clo[target] = old
        if fixed_row is not None:
            mp.advice[st.v_lo.index][fixed_row] = saved_state


def test_push_accumulator_matches_code(mock, wb):
    """Positive: every pd_last row's accumulator equals the big-endian
    immediate read directly from the real code bytes."""
    circ, mp = mock
    bc = circ.bytecode
    q_col = mp.fixed[bc.q_row.index]
    last_col = mp.advice[bc.pd_last.index]
    idx_col = mp.advice[bc.index.index]
    hi_col = mp.advice[bc.hash_hi.index]
    checked = 0
    codes = {int(h, 16): c for h, c in wb.bytecode_map.items()}
    # proper forward disassembly: {(hash_hi, end_index) -> immediate}
    imms = {}
    for h, code in codes.items():
        i = 0
        while i < len(code):
            b = code[i]
            if 0x60 <= b <= 0x7F:
                ln = b - 0x5F
                if i + ln < len(code):  # truncated pushes have no pd_last row
                    imms[(h >> 128, i + ln)] = int.from_bytes(
                        code[i + 1 : i + 1 + ln], "big"
                    )
                i += 1 + ln
            else:
                i += 1
    for r in range(mp.n):
        if q_col[r] == 1 and last_col[r] == 1:
            key = (int(hi_col[r]), int(idx_col[r]))
            assert key in imms, f"pd_last row not at a push end: {key}"
            acc = (int(mp.advice[bc.acc_hi.index][r]) << 128) | int(
                mp.advice[bc.acc_lo.index][r]
            )
            assert acc == imms[key], f"acc mismatch at code index {key[1]}"
            checked += 1
    assert checked > 0, "fixture has no push immediates?"


# ---- MUL word-arithmetic builder (VERDICT round-4 #6) ----------------------

MUL_CHUNK = "/root/reference/integration/tests/extra_traces/batch_300/chunk_12263"


@pytest.fixture(scope="module")
def wb_mul():
    traces = load_chunk(MUL_CHUNK)[:1]
    wb2 = chunk_trace_to_witness_block(traces)
    muls = [
        s for s in wb2.steps
        if s.op_byte == 0x02 and s.sp >= 0 and len(s.stack_ops) >= 3
    ]
    if not muls:
        pytest.skip("fixture slice has no replayed MUL steps")
    return wb2


def test_mul_steps_accepted(wb_mul):
    circ = ScrollSuperCircuit.new_from_block(wb_mul)
    mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    fails = mp.verify_par()
    assert fails == [], [str(f) for f in fails[:5]]


def test_tampered_mul_result_rejected(wb_mul):
    # corrupt one MUL's written result in the witness (both the rw row
    # and the step cell, the best-effort adversary) — the 64-bit-limb
    # product check must reject it
    import copy

    wb2 = copy.deepcopy(wb_mul)
    victim_step = next(
        s for s in wb2.steps
        if s.op_byte == 0x02 and s.sp >= 0 and len(s.stack_ops) >= 3
    )
    # stack_ops: [read a, read b, write c]; rw rows carry the same values
    c_rwc = victim_step.stack_rwc0 + 2
    victim_row = next(r for r in wb2.rw_rows if r.rwc == c_rwc)
    victim_row.value ^= 1
    ops = list(victim_step.stack_ops)
    slot, val, isw = ops[2]
    ops[2] = (slot, val ^ 1, isw)
    victim_step.stack_ops = ops
    circ = ScrollSuperCircuit.new_from_block(wb2)
    # rejection can surface two ways: the carry witness has NO in-range
    # value (assignment asserts — there is no satisfying assignment at
    # all), or the mock reports the violated product constraint
    try:
        mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    except AssertionError as e:
        assert "range_check witness" in str(e)
        return
    fails = mp.verify_par()
    assert fails != [], "tampered MUL result accepted"


# ---- DIV/MOD word-arithmetic (round-5 breadth: MulAddWords + rem<b) --------


def test_div_mod_steps_accepted(wb_mul):
    divs = [
        s for s in wb_mul.steps
        if s.op_byte in (0x04, 0x06) and s.sp >= 0 and len(s.stack_ops) >= 3
    ]
    assert divs, "fixture slice has no replayed DIV/MOD steps"
    # semantic sanity of the replay itself: c == a//b resp. a%b
    for s in divs:
        a, b, c = (op[1] for op in s.stack_ops[:3])
        want = (a % b if s.op_byte == 0x06 else a // b) if b else 0
        assert c == want
    circ = ScrollSuperCircuit.new_from_block(wb_mul)
    mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    fails = mp.verify_par()
    assert fails == [], [str(f) for f in fails[:5]]


@pytest.mark.parametrize("bump", [1, 1 << 200])
def test_tampered_div_result_rejected(wb_mul, bump):
    # corrupt one DIV's written quotient (rw row + step cell, the
    # best-effort adversary): q*b + r == a with r < b has no satisfying
    # witness for a wrong quotient — off-by-one underflows the remainder,
    # a high-limb bump overflows q*b past the dividend
    import copy

    wb2 = copy.deepcopy(wb_mul)
    victim_step = next(
        s for s in wb2.steps
        if s.op_byte == 0x04 and s.sp >= 0 and len(s.stack_ops) >= 3
        and s.stack_ops[1][1] != 0
    )
    c_rwc = victim_step.stack_rwc0 + 2
    victim_row = next(r for r in wb2.rw_rows if r.rwc == c_rwc)
    victim_row.value = (victim_row.value + bump) % (1 << 256)
    ops = list(victim_step.stack_ops)
    slot, val, isw = ops[2]
    ops[2] = (slot, (val + bump) % (1 << 256), isw)
    victim_step.stack_ops = ops
    circ = ScrollSuperCircuit.new_from_block(wb2)
    # rejection surfaces either as an assignment-time no-satisfying-
    # witness assert or as a violated constraint in the mock
    try:
        mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    except AssertionError as e:
        msg = str(e)
        assert "range_check witness" in msg or "unsatisfied" in msg
        return
    fails = mp.verify_par()
    assert fails != [], "tampered DIV result accepted"


# ---- LT/GT/EQ word comparators (round-5 breadth) ---------------------------


def test_cmp_steps_accepted(wb_mul):
    cmps = [
        s for s in wb_mul.steps
        if s.op_byte in (0x10, 0x11, 0x14) and s.sp >= 0
        and len(s.stack_ops) >= 3
    ]
    assert cmps, "fixture slice has no replayed LT/GT/EQ steps"
    for s in cmps:
        a, b, c = (op[1] for op in s.stack_ops[:3])
        want = {0x10: int(a < b), 0x11: int(a > b), 0x14: int(a == b)}[
            s.op_byte
        ]
        assert c == want
    # (mock satisfaction of the whole fixture is asserted by
    # test_div_mod_steps_accepted on the same witness block)


def test_tampered_cmp_result_rejected(wb_mul):
    # flip one comparator's pushed bit: the gated borrow-chain witnesses
    # for the flipped direction cannot exist
    import copy

    wb2 = copy.deepcopy(wb_mul)
    victim_step = next(
        s for s in wb2.steps
        if s.op_byte in (0x10, 0x11, 0x14) and s.sp >= 0
        and len(s.stack_ops) >= 3
    )
    c_rwc = victim_step.stack_rwc0 + 2
    victim_row = next(r for r in wb2.rw_rows if r.rwc == c_rwc)
    victim_row.value ^= 1
    ops = list(victim_step.stack_ops)
    slot, val, isw = ops[2]
    ops[2] = (slot, val ^ 1, isw)
    victim_step.stack_ops = ops
    circ = ScrollSuperCircuit.new_from_block(wb2)
    try:
        mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    except AssertionError as e:
        msg = str(e)
        assert "range_check witness" in msg or "unsatisfied" in msg
        return
    fails = mp.verify_par()
    assert fails != [], "tampered comparator result accepted"


# ---- ISZERO/NOT unary word ops (round-5 breadth) ---------------------------


def test_unary_steps_accepted(wb_mul):
    uns = [
        s for s in wb_mul.steps
        if s.op_byte in (0x15, 0x19) and s.sp >= 0 and len(s.stack_ops) >= 2
    ]
    assert uns, "fixture slice has no replayed ISZERO/NOT steps"
    M256 = (1 << 256) - 1
    for s in uns:
        a, c = s.stack_ops[0][1], s.stack_ops[1][1]
        want = int(a == 0) if s.op_byte == 0x15 else (M256 ^ a)
        assert c == want


def test_tampered_iszero_result_rejected(wb_mul):
    import copy

    wb2 = copy.deepcopy(wb_mul)
    victim_step = next(
        s for s in wb2.steps
        if s.op_byte == 0x15 and s.sp >= 0 and len(s.stack_ops) >= 2
    )
    c_rwc = victim_step.stack_rwc0 + 1
    victim_row = next(r for r in wb2.rw_rows if r.rwc == c_rwc)
    victim_row.value ^= 1
    ops = list(victim_step.stack_ops)
    slot, val, isw = ops[1]
    ops[1] = (slot, val ^ 1, isw)
    victim_step.stack_ops = ops
    circ = ScrollSuperCircuit.new_from_block(wb2)
    try:
        mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    except AssertionError as e:
        msg = str(e)
        assert "range_check witness" in msg or "unsatisfied" in msg
        return
    fails = mp.verify_par()
    assert fails != [], "tampered ISZERO result accepted"


# ---- SLOAD/SSTORE storage binding (VERDICT round-4 #6) ---------------------


def test_sload_steps_bound(wb_mul):
    wb = wb_mul
    """Fixture SLOAD/SSTORE sem steps carry their storage row's rwc, and
    the row matches (addr, key, value, is_write)."""
    from scroll_prover_tpu.witness.block import TAG_STORAGE

    bound = 0
    for s in wb.steps:
        if s.sp >= 0 and s.op_byte in (0x54, 0x55) and s.store_ops:
            (s_addr, s_slot, s_val, s_isw, s_tr, rwc) = s.store_ops[0]
            row = wb.rw_rows[rwc - 1]
            assert row.rwc == rwc
            if not s_tr:
                assert row.tag == TAG_STORAGE
            assert row.addr == s_addr == s.addr
            assert row.key == s_slot
            assert row.value == s_val
            assert row.is_write == s_isw
            bound += 1
    if bound == 0:
        pytest.skip("fixture slice has no replayed SLOAD/SSTORE")


def test_tampered_sload_value_rejected(wb_mul):
    wb = wb_mul
    """Change the value an SLOAD claims to have loaded — in the stack
    write row, the step cell AND the storage row (full adversarial
    repair): read-consistency at the storage key group must break."""
    import copy

    wb2 = copy.deepcopy(wb)
    victim = None
    for s in wb2.steps:
        if (
            s.sp >= 0 and s.op_byte == 0x54 and s.store_ops
            and not s.store_ops[0][3]  # a read row
        ):
            victim = s
            break
    if victim is None:
        pytest.skip("no replayed SLOAD in fixture slice")
    (s_addr, s_slot, s_val, s_isw, s_tr, rwc) = victim.store_ops[0]
    new_val = s_val ^ 1
    # repair everything the adversary controls
    wb2.rw_rows[rwc - 1].value = new_val
    st_write_rwc = victim.stack_rwc0 + 1
    wb2.rw_rows[st_write_rwc - 1].value = new_val
    ops = list(victim.stack_ops)
    ops[1] = (ops[1][0], new_val, ops[1][2])
    victim.stack_ops = ops
    victim.store_ops = ((s_addr, s_slot, new_val, s_isw, s_tr, rwc),)
    circ = ScrollSuperCircuit.new_from_block(wb2)
    mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    fails = mp.verify_par()
    assert fails != [], "tampered SLOAD value accepted"


# ---- CALL-family depth transitions (VERDICT round-4 #6) --------------------


def test_depth_transitions_present(wb_mul):
    """batch_300 has sub-calls: some adjacent sem steps cross frames and
    the witness marks the direction bit for each."""
    steps = [s for s in wb_mul.steps if s.sp >= 0]
    crossings = [
        (a, b) for a, b in zip(steps, steps[1:])
        if a.call_id != b.call_id and a.tx_index == b.tx_index
    ]
    if not crossings:
        pytest.skip("no in-tx frame crossings in fixture slice")
    for a, b in crossings:
        assert abs(b.depth - a.depth) == 1
        if b.depth > a.depth:
            assert b.sp == 0  # fresh frame starts with an empty stack


def test_tampered_call_depth_rejected(wb_mul):
    """Claiming a frame switch jumps two levels (repairing d_up either
    way) violates the +-1 depth-step gate."""
    circ = ScrollSuperCircuit.new_from_block(wb_mul)
    mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    ev = circ.evm
    qn = mp.fixed[ev.q_semn.index]
    e_col = mp.advice[ev.cid_eq.index]
    te_col = mp.advice[ev.tx_eq.index]
    target = next(
        (
            r for r in range(mp.n)
            if qn[r] == 1 and e_col[r] == 0 and te_col[r] == 1
        ),
        None,
    )
    if target is None:
        pytest.skip("no in-tx frame crossing row")
    dcol = mp.advice[ev.depth.index]
    old = int(dcol[target + 1])
    dcol[target + 1] = old + 1  # depth now jumps by 2 (or stays put)
    try:
        failures = mp.verify()
        assert failures, "double depth jump accepted"
        assert any("evm/depth" in str(f) for f in failures)
    finally:
        dcol[target + 1] = old


# ---- MLOAD/MSTORE word binding (VERDICT round-4 #6) ------------------------


def test_mload_words_bound(wb_mul):
    """MLOAD/MSTORE sem steps carry their TAG_MEMORY word row's rwc."""
    from scroll_prover_tpu.witness.block import TAG_MEMORY

    bound = 0
    for s in wb_mul.steps:
        if s.sp >= 0 and s.op_byte in (0x51, 0x52) and s.mem_ops:
            off, word, isw, rwc = s.mem_ops[0]
            row = wb_mul.rw_rows[rwc - 1]
            assert row.rwc == rwc and row.tag == TAG_MEMORY
            assert row.key == off and row.value == word
            assert row.is_write == isw
            bound += 1
    if bound == 0:
        pytest.skip("no replayed MLOAD/MSTORE in fixture slice")


def test_tampered_mload_value_rejected(wb_mul):
    """An MLOAD claiming a different word than the last exact-offset
    MSTORE — with the memory row, stack row and step cells all repaired —
    must break read-consistency at the memory key group."""
    import copy

    from scroll_prover_tpu.witness.block import TAG_MEMORY

    wb2 = copy.deepcopy(wb_mul)
    # find an MLOAD whose memory row chains after a write at the same key
    victim = None
    for s in wb2.steps:
        if s.sp >= 0 and s.op_byte == 0x51 and s.mem_ops:
            off, word, isw, rwc = s.mem_ops[0]
            prior = [
                r for r in wb2.rw_rows
                if r.tag == TAG_MEMORY and r.addr == wb2.rw_rows[rwc - 1].addr
                and r.key == off and r.rwc < rwc and r.is_write
            ]
            if prior:
                victim = s
                break
    if victim is None:
        pytest.skip("no chained MLOAD in fixture slice")
    off, word, isw, rwc = victim.mem_ops[0]
    new_word = word ^ 1
    wb2.rw_rows[rwc - 1].value = new_word
    wb2.rw_rows[victim.stack_rwc0].value = new_word  # stack write row @ +1
    ops = list(victim.stack_ops)
    ops[1] = (ops[1][0], new_word, ops[1][2])
    victim.stack_ops = ops
    victim.mem_ops = ((off, new_word, isw, rwc),)
    circ = ScrollSuperCircuit.new_from_block(wb2)
    mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    fails = mp.verify_par()
    assert fails != [], "tampered MLOAD word accepted"
