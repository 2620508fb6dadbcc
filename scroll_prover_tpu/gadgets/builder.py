"""Row-oriented arithmetic chip: the gadget substrate.

One wide custom gate over 5 advice columns w0..w4 with per-row fixed
coefficients (all fixed columns, zero outside used rows, so the gate
vanishes on blinding rows):

    qm*(w0*w1) + qm2*(w2*w3) + qa*w0 + qb*w1 + qc*w2 + qd*w3 + qe*w4 + qk = 0

plus a boolean toggle gate `qbool * w0 * (w0 - 1) = 0` and range lookups on
(w0, w1, w3, w4) against a 2^lookup_bits fixed table. Values flow between
rows via copy (permutation) constraints — the flattened-layouter equivalent
of halo2-base's vertical gate (SURVEY.md section 2.2 halo2-base row;
reference layer configs parameterize the same knobs: num_advice,
lookup_bits — /root/reference/integration/configs/layer2.config).

The builder runs the SAME op sequence at keygen (dummy witness) and prove
time; fixed-column content derives only from the op sequence, so circuit
programs must be value-independent (no branching on witness values).
"""
from __future__ import annotations

from dataclasses import dataclass

from ..fields.bn254 import FR_MOD
from ..proof_system.plonk.cs import ConstraintSystem


@dataclass(frozen=True)
class Cell:
    col: object  # ColumnRef
    row: int
    val: int  # witness value mod FR_MOD (host-side shadow)


# fixed-coefficient slots, in declaration order
_COEFFS = ("qm", "qm2", "qa", "qb", "qc", "qd", "qe", "qk")
_RANGE_SLOTS = (0, 1, 3, 4)  # advice columns carrying range-checked cells


class Builder:
    """Declares columns/gates (configure) and assigns rows (assign)."""

    W = 5

    def configure(self, cs: ConstraintSystem, lookup_bits: int = 12):
        self.lookup_bits = lookup_bits
        self.w = [cs.advice_column() for _ in range(self.W)]
        self.q = {name: cs.fixed_column() for name in _COEFFS}
        self.qbool = cs.fixed_column()
        self.range_table = cs.fixed_column()
        self.q_range = {s: cs.fixed_column() for s in _RANGE_SLOTS}
        for wc in self.w:
            cs.enable_permutation(wc)

        q = {k: c.query() for k, c in self.q.items()}
        w = [c.query() for c in self.w]
        cs.gate(
            "gadget/arith",
            q["qm"] * (w[0] * w[1]) + q["qm2"] * (w[2] * w[3])
            + q["qa"] * w[0] + q["qb"] * w[1] + q["qc"] * w[2]
            + q["qd"] * w[3] + q["qe"] * w[4] + q["qk"],
        )
        cs.gate("gadget/bool", self.qbool.query() * w[0] * (w[0] - 1))
        for s in _RANGE_SLOTS:
            cs.lookup(
                f"gadget/range_w{s}",
                [self.q_range[s].query() * self.w[s].query()],
                [self.range_table.query()],
            )
        return self

    # -- assignment --------------------------------------------------------

    def begin(self, cs: ConstraintSystem, fixed, adv, n: int, row0: int):
        self.cs = cs
        self.fixed = fixed
        self.adv = adv
        self.n = n
        self.row = row0
        for v in range(1 << self.lookup_bits):
            fixed[self.range_table.index][v] = v
        return self

    def rows_used(self) -> int:
        return self.row

    def _emit(self, coeffs: dict, vals: list, copies=(), ranges=()) -> list[Cell]:
        """One gate row. vals[i] may be None (unused slot -> 0). copies is a
        list of (slot, Cell) equal-constraints; ranges lists slots whose
        value is range-looked-up."""
        r = self.row
        assert r < self.n - 8, "gadget region overflow"
        cells = []
        for i in range(self.W):
            v = int(vals[i]) % FR_MOD if vals[i] is not None else 0
            self.adv[self.w[i].index][r] = v
            cells.append(Cell(self.w[i], r, v))
        for name, cv in coeffs.items():
            self.fixed[self.q[name].index][r] = int(cv) % FR_MOD
        for slot, src in copies:
            self.cs.copy(self.w[slot], r, src.col, src.row)
        for slot in ranges:
            assert slot in _RANGE_SLOTS
            self.fixed[self.q_range[slot].index][r] = 1
        self.row += 1
        return cells

    # -- primitive ops -----------------------------------------------------

    def const(self, v: int) -> Cell:
        v = int(v) % FR_MOD
        c = self._emit({"qa": 1, "qk": -v}, [v, None, None, None, None])
        return c[0]

    def add(self, a: Cell, b: Cell) -> Cell:
        out = (a.val + b.val) % FR_MOD
        c = self._emit(
            {"qa": 1, "qb": 1, "qe": -1},
            [a.val, b.val, None, None, out],
            copies=[(0, a), (1, b)],
        )
        return c[4]

    def sub(self, a: Cell, b: Cell) -> Cell:
        out = (a.val - b.val) % FR_MOD
        c = self._emit(
            {"qa": 1, "qb": -1, "qe": -1},
            [a.val, b.val, None, None, out],
            copies=[(0, a), (1, b)],
        )
        return c[4]

    def mul(self, a: Cell, b: Cell) -> Cell:
        out = a.val * b.val % FR_MOD
        c = self._emit(
            {"qm": 1, "qe": -1},
            [a.val, b.val, None, None, out],
            copies=[(0, a), (1, b)],
        )
        return c[4]

    def mul_add(self, a: Cell, b: Cell, d: Cell) -> Cell:
        """a*b + d."""
        out = (a.val * b.val + d.val) % FR_MOD
        c = self._emit(
            {"qm": 1, "qd": 1, "qe": -1},
            [a.val, b.val, None, d.val, out],
            copies=[(0, a), (1, b), (3, d)],
        )
        return c[4]

    def lin(self, terms: list[tuple[int, Cell]], k: int = 0) -> Cell:
        """sum coeff_i * cell_i + k. Chains rows 4 terms at a time."""
        acc: Cell | None = None
        pending = list(terms)
        kk = int(k) % FR_MOD
        while True:
            batch, pending = pending[:3], pending[3:]
            slots = [None, None, None, None, None]
            coeffs = {"qe": -1}
            copies = []
            out = kk if acc is None else (kk + acc.val) % FR_MOD
            names = ("qa", "qb", "qc", "qd")
            idx = 0
            if acc is not None:
                slots[idx] = acc.val
                coeffs[names[idx]] = 1
                copies.append((idx, acc))
                idx += 1
            for co, cell in batch:
                slots[idx] = cell.val
                coeffs[names[idx]] = int(co) % FR_MOD
                copies.append((idx, cell))
                out = (out + co * cell.val) % FR_MOD
                idx += 1
            if kk:
                coeffs["qk"] = kk
                kk = 0
            slots[4] = out
            acc = self._emit(coeffs, slots, copies=copies)[4]
            if not pending:
                return acc

    def assert_lin_zero(self, terms: list[tuple[int, Cell]], k: int = 0):
        """Constrain sum coeff_i * cell_i + k == 0 (chained; final row has
        no output slot)."""
        if len(terms) > 4:
            head = self.lin(terms[:3], k)
            return self.assert_lin_zero([(1, head)] + terms[3:], 0)
        slots = [None] * self.W
        coeffs = {}
        copies = []
        names = ("qa", "qb", "qc", "qd")
        acc = int(k) % FR_MOD
        for i, (co, cell) in enumerate(terms):
            slots[i] = cell.val
            coeffs[names[i]] = int(co) % FR_MOD
            copies.append((i, cell))
            acc = (acc + co * cell.val) % FR_MOD
        if k:
            coeffs["qk"] = int(k) % FR_MOD
        assert acc % FR_MOD == 0, "assert_lin_zero: unsatisfied (witness bug)"
        self._emit(coeffs, slots, copies=copies)

    def assert_equal(self, a: Cell, b: Cell):
        assert a.val == b.val, "assert_equal: unsatisfied (witness bug)"
        self.cs.copy(a.col, a.row, b.col, b.row)

    def assert_mul(self, a: Cell, b: Cell, prod: Cell):
        """Constrain a*b == prod without allocating an output."""
        assert a.val * b.val % FR_MOD == prod.val, "assert_mul unsatisfied"
        self._emit(
            {"qm": 1, "qc": -1},
            [a.val, b.val, prod.val, None, None],
            copies=[(0, a), (1, b), (2, prod)],
        )

    def dot_acc(self, pairs: list[tuple[Cell, Cell]], init: Cell | None = None) -> Cell:
        """sum a_i*b_i (+ init): two products per row, accumulator chained
        through w2 (qc slot) so each row is out = a0*b0 + a1*b1 + acc."""
        acc = init
        pending = list(pairs)
        if not pending:
            return acc if acc is not None else self.const(0)
        while pending:
            batch, pending = pending[:2], pending[2:]
            slots = [None] * self.W
            coeffs = {"qe": -1}
            copies = []
            out = acc.val if acc is not None else 0
            a0, b0 = batch[0]
            slots[0], slots[1] = a0.val, b0.val
            coeffs["qm"] = 1
            copies += [(0, a0), (1, b0)]
            out = (out + a0.val * b0.val) % FR_MOD
            if len(batch) == 2:
                a1, b1 = batch[1]
                slots[2], slots[3] = a1.val, b1.val
                coeffs["qm2"] = 1
                copies += [(2, a1), (3, b1)]
                out = (out + a1.val * b1.val) % FR_MOD
                if acc is not None:
                    # no free input slot this row: fold acc via an add row
                    slots[4] = (out - acc.val) % FR_MOD
                    t = self._emit(coeffs, slots, copies=copies)[4]
                    acc = self.add(acc, t)
                    continue
            elif acc is not None:
                slots[2] = acc.val
                coeffs["qc"] = 1
                copies.append((2, acc))
            slots[4] = out
            acc = self._emit(coeffs, slots, copies=copies)[4]
        return acc

    def witness(self, v: int) -> Cell:
        """Unconstrained advice cell (callers must constrain it)."""
        c = self._emit({}, [int(v) % FR_MOD, None, None, None, None])
        return c[0]

    def assert_bit(self, c: Cell):
        """Boolean-constrain a cell in place: re-expose it on a qbool row."""
        r = self.row
        out = self._emit({}, [c.val, None, None, None, None], copies=[(0, c)])
        self.fixed[self.qbool.index][r] = 1
        return out[0]

    def select(self, bit: Cell, a: Cell, b: Cell) -> Cell:
        """bit ? a : b  (bit must already be boolean-constrained)."""
        d = self.sub(a, b)
        return self.mul_add(bit, d, b)

    def is_zero(self, a: Cell) -> Cell:
        """1 if a == 0 else 0. inv is a free witness: z = 1 - a*inv forces
        z=0 when a!=0 (via a*z=0), z=1 when a=0."""
        inv = pow(a.val, -1, FR_MOD) if a.val else 0
        z_val = 0 if a.val else 1
        z = self._emit(
            {"qm": 1, "qe": 1, "qk": -1},
            [a.val, inv, None, None, z_val],
            copies=[(0, a)],
        )[4]
        self._emit(
            {"qm": 1}, [a.val, z.val, None, None, None], copies=[(0, a), (1, z)]
        )
        return z

    # -- range machinery ---------------------------------------------------

    def range_row(self, vals: list[int]) -> list[Cell]:
        """Up to 4 range-checked witnesses on one row (slots w0,w1,w3,w4)."""
        assert len(vals) <= len(_RANGE_SLOTS)
        slots = [None] * self.W
        cells_idx = []
        for v, s in zip(vals, _RANGE_SLOTS):
            assert 0 <= int(v) < (1 << self.lookup_bits)
            slots[s] = int(v)
            cells_idx.append(s)
        out = self._emit({}, slots, ranges=cells_idx[: len(vals)])
        return [out[s] for s in cells_idx]

    def range_check(self, c: Cell, bits: int) -> None:
        """Constrain c < 2^bits via lookup_bits-chunk decomposition."""
        b = self.lookup_bits
        n_chunks = (bits + b - 1) // b
        v = c.val
        assert v < (1 << bits), f"range_check witness {v} >= 2^{bits}"
        chunks = [(v >> (b * i)) & ((1 << b) - 1) for i in range(n_chunks)]
        top_bits = bits - b * (n_chunks - 1)
        chunk_cells: list[Cell] = []
        pend = list(chunks)
        while pend:
            batch, pend = pend[:4], pend[4:]
            chunk_cells += self.range_row(batch)
        if top_bits < b:
            # shifted top chunk must also be < 2^b  =>  top < 2^top_bits
            shifted = chunks[-1] << (b - top_bits)
            (sc,) = self.range_row([shifted])
            self.assert_lin_zero(
                [(1 << (b - top_bits), chunk_cells[-1]), (-1, sc)]
            )
        # recomposition: sum chunk_i * 2^(b i) == c
        self.assert_lin_zero(
            [(1 << (b * i), cc) for i, cc in enumerate(chunk_cells)] + [(-1, c)]
        )

    def witness_ranged(self, v: int, bits: int) -> Cell:
        c = self.witness(v)
        self.range_check(c, bits)
        return c

    def decompose_bits(self, c: Cell, n_bits: int) -> list[Cell]:
        """LSB-first boolean decomposition of c (must satisfy c < 2^n_bits)."""
        v = c.val
        assert v < (1 << n_bits)
        bits = []
        for i in range(n_bits):
            bc = self.witness((v >> i) & 1)
            bits.append(self.assert_bit(bc))
        self.assert_lin_zero(
            [(1 << i, bc) for i, bc in enumerate(bits)] + [(-1, c)]
        )
        return bits

    def expose_public(self, c: Cell, instance_col, instance_row: int):
        self.cs.copy(instance_col, instance_row, c.col, c.row)
