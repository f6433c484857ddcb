"""HyperLogLog distinct-count sketch (Flajolet et al. 2007), built to
be bit-identical between the Ray pipeline and the DuckDB oracle.

"How many distinct URLs / terms / (doc, term) pairs?" at 100 TB is the
second canonical sketch question (after heavy hitters): the exact
answer needs a corpus-wide distinct exchange, the HLL answer is a
4096-register mergeable summary.

Cross-engine determinism, piece by piece (the catalog discipline):

- hash: ``md5_number_lower`` (DuckDB built-in) == last 8 md5 digest
  bytes little-endian (the same twin the simhash entry uses).
- register index = top ``P`` hash bits; the remaining ``64-P`` bits w
  give rank = (64-P) + 1 - bit_length(w) — bit_length computed by
  EXACT integer comparisons on both sides (np.searchsorted against
  the powers-of-two table here, a generated CASE ladder in SQL);
  no float touches the registers.
- the harmonic sum is EXACT integer arithmetic: each register of rank
  r contributes 2^(SCALE - r); the raw estimate is then
  float(ALPHA_NUM) / float(S) — one conversion + one division, both
  IEEE-deterministic, with ALPHA_NUM a precomputed integer literal
  shared by both engines (DuckDB casts HUGEINT->DOUBLE the same way).
- the standard small-range branch (raw <= 2.5 m and empty registers
  exist) switches to linear counting m * ln(m / V); the branch
  predicate compares the identical unrounded raw, and the one libm
  call (ln) is absorbed by round-half-away at 4 digits on both sides
  (the idf_q / pmi pattern).

Scale shape: per-block register partials (<= m rows each) merge
through one bounded groupby(register).max — m = 4096 keys no matter
the corpus; the driver collect is register-domain-bounded (the
sanctioned value-domain-bounded collect tier).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HLL_P = 12                      # 2^12 = 4096 registers
HLL_M = 1 << HLL_P
_WBITS = 64 - HLL_P             # rank source bits
HLL_MAX_RANK = _WBITS + 1       # w == 0 case
HLL_SCALE = HLL_MAX_RANK        # contribution = 2^(SCALE - rank) >= 1
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# exact integer numerator of the raw estimate: alpha * m^2 * 2^SCALE
ALPHA_NUM = round(_ALPHA * HLL_M * HLL_M * (1 << HLL_SCALE))
# powers-of-two table for exact vectorized bit_length
_POW2 = np.array([1 << i for i in range(_WBITS)], dtype=np.uint64)


def md5_lower64_array(values: list[str]) -> np.ndarray:
    """md5_number_lower for a list of strings (hashes each value once
    via a dict — callers pass DISTINCT-ish streams; HLL is insensitive
    to duplicates anyway)."""
    import hashlib

    lut: dict[str, int] = {}
    out = np.empty(len(values), dtype=np.uint64)
    for j, v in enumerate(values):
        h = lut.get(v)
        if h is None:
            h = int.from_bytes(hashlib.md5(v.encode()).digest()[8:16], "little")
            lut[v] = h
        out[j] = h
    return out


def registers_from_hashes(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes -> (register index, rank) arrays, exact integer
    arithmetic only."""
    idx = (h >> np.uint64(_WBITS)).astype(np.int64)
    w = h & np.uint64((1 << _WBITS) - 1)
    # bit_length(w) by exact comparisons: count powers of two <= w
    bl = np.searchsorted(_POW2, w, side="right")
    rank = np.where(w > 0, _WBITS + 1 - bl, HLL_MAX_RANK).astype(np.int64)
    return idx, rank


def register_partial(values: list[str]) -> pa.Table:
    """One batch of string values -> its (idx, rank) register partial
    (max rank per touched register; <= m rows)."""
    if not values:
        return pa.table(
            {"idx": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())}
        )
    idx, rank = registers_from_hashes(md5_lower64_array(values))
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(regs, idx, rank)
    touched = np.nonzero(regs)[0]
    return pa.table(
        {"idx": pa.array(touched, pa.int64()),
         "rank": pa.array(regs[touched], pa.int64())}
    )


def estimate_from_registers(reg_rows: list[tuple[int, int]]) -> dict:
    """Merged (idx, max_rank) rows -> the HLL estimate dict.

    Returns v_zero (empty registers), the unrounded raw estimate's
    rounded form, and the branch-selected estimate — all reproducing
    the SQL oracle bit for bit.
    """
    from ..stages.textstats import round_half_away

    regs = np.zeros(HLL_M, dtype=np.int64)
    for i, r in reg_rows:
        regs[i] = max(regs[i], r)
    v_zero = int(np.sum(regs == 0))
    # exact integer harmonic sum: empty register rank 0 -> 2^SCALE
    s_int = int(np.sum((np.int64(1) << (HLL_SCALE - regs)).astype(object)))
    raw = float(ALPHA_NUM) / float(s_int)  # one cast each + one division
    if raw <= 2.5 * HLL_M and v_zero > 0:
        est = float(round_half_away(
            np.array([HLL_M * np.log(HLL_M / float(v_zero))]), 4)[0])
    else:
        est = float(round_half_away(np.array([raw]), 4)[0])
    return {"v_zero": v_zero, "est": est}


def sql_rank_case(w_expr: str) -> str:
    """The bit_length CASE ladder: exact integer comparisons, one WHEN
    per possible rank — the generated-SQL twin of registers_from_hashes."""
    whens = [f"WHEN {w_expr} = 0 THEN {HLL_MAX_RANK}"]
    for r in range(1, _WBITS + 1):
        whens.append(f"WHEN {w_expr} >= {1 << (_WBITS - r)} THEN {r}")
    return "CASE " + " ".join(whens) + " END"


def sql_pow2_values() -> str:
    """(rank, contribution 2^(SCALE-rank)) VALUES rows incl. rank 0 for
    empty registers — HUGEINT-safe literals."""
    return ", ".join(
        f"({r}, {1 << (HLL_SCALE - r)})" for r in range(0, HLL_MAX_RANK + 1)
    )
