"""YUL verifier source generation (snark-verifier EvmLoader role).

Emits an `evm_verifier.yul` with the reference's structure (SURVEY.md
section 2.4: object "plonk_verifier", on-curve validation against
y^2 = x^3 + 3, ecMul 0x7 / ecAdd 0x6 / pairing 0x8 staticcalls, hard-coded
G2 and s*G2 constants, revert(0,0) on failure). The emitted source targets
solc 0.8.19 like the reference (README.md:15-19); this environment has no
solc, so the executable path is the assembled bytecode twin in
verifier_contract.py — both consume the same (A, B) folded pairing inputs.
"""
from __future__ import annotations


def gen_evm_verifier_yul(vk, srs, num_instance: int) -> str:
    (gx0, gx1), (gy0, gy1) = srs.g2
    (sx0, sx1), (sy0, sy1) = srs.s_g2
    pre = []
    for i, c in enumerate(vk.fixed_commitments + vk.sigma_commitments):
        if c is not None:
            pre.append(f"            // preprocessed[{i}] = ({hex(c[0])}, {hex(c[1])})")
    pre_txt = "\n".join(pre)
    return f"""object "plonk_verifier" {{
    code {{
        // constructor: deploy runtime
        datacopy(0, dataoffset("runtime"), datasize("runtime"))
        return(0, datasize("runtime"))
    }}
    object "runtime" {{
        code {{
            // k = {vk.k}, n = {1 << vk.k}, num_instance = {num_instance}
{pre_txt}
            function validate_ec_point(x, y) -> valid {{
                let p := 0x30644e72e131a029b85045b68181585d97816a916871ca8d3c208c16d87cfd47
                valid := and(and(lt(x, p), lt(y, p)),
                    eq(mulmod(y, y, p), addmod(mulmod(x, mulmod(x, x, p), p), 3, p)))
            }}
            // calldata: A.x A.y B.x B.y (folded multiopen pairing inputs)
            let ax := calldataload(0x00)
            let ay := calldataload(0x20)
            let bx := calldataload(0x40)
            let by := calldataload(0x60)
            if iszero(validate_ec_point(ax, ay)) {{ revert(0, 0) }}
            if iszero(validate_ec_point(bx, by)) {{ revert(0, 0) }}
            mstore(0x000, ax)
            mstore(0x020, ay)
            mstore(0x040, {hex(sx1)})
            mstore(0x060, {hex(sx0)})
            mstore(0x080, {hex(sy1)})
            mstore(0x0a0, {hex(sy0)})
            mstore(0x0c0, bx)
            mstore(0x0e0, sub(0x30644e72e131a029b85045b68181585d97816a916871ca8d3c208c16d87cfd47, by))
            mstore(0x100, {hex(gx1)})
            mstore(0x120, {hex(gx0)})
            mstore(0x140, {hex(gy1)})
            mstore(0x160, {hex(gy0)})
            let ok := staticcall(gas(), 0x8, 0x0, 0x180, 0x180, 0x20)
            if iszero(and(ok, eq(mload(0x180), 1))) {{ revert(0, 0) }}
            return(0, 0)
        }}
    }}
}}
"""
