"""Deterministic distinct-count sketches (HyperLogLog from scratch).

Spark's builtin ``approx_count_distinct`` is HLL++ whose register
encoding is engine-private, so its raw estimate can only be gated
with tolerance booleans (``approx_distinct_parts``). This module
builds the classic Flajolet-et-al HyperLogLog *portably*: the
register plane and the estimate are exact functions of md5, so DuckDB
replays them bit-for-bit and the driver's value-hash gate covers the
sketch itself, not just a tolerance assertion.

Shared-dialect construction (identical SQL text on Spark and DuckDB,
the ``textops._hex4_int`` discipline):

* register index = value of the first ``P_BITS`` md5 bits (instr over
  a hex-digit lookup — no engine-specific conv/from_hex);
* rank ``rho`` = position of the first 1-bit in the next 52 bits,
  found with ``instr(bits, '1')`` over a nibble→4-bit lookup string;
* the harmonic sum is kept in INTEGER space: each register
  contributes ``2^(53-reg)`` (exact in BIGINT for reg ∈ 1..53), so
  the aggregation is summation-order-free — the double division and
  the ln() of the linear-counting branch happen once, on identical
  inputs, in the final projection (cross-engine ln precedent:
  zipf/surprisal/PMI).

Scale design (the 100 TB shape): the sketch path never shuffles
distinct keys — ``GROUP BY (group, idx) MAX(rho)`` partial-aggregates
map-side to at most ``m`` rows per group per task, so the wire
carries register slivers, not data. Registers merge by MAX, the
HLL merge law, so per-partition planes union freely (the property
``test_sketch.py`` asserts). The exact comparator in the audit query
is test-scale instrumentation only.

Reference: the reference repo has no sketch operators (spec-only,
reference README.md:87-89); this extends SURVEY.md §2.11 alongside
the count-min-sketch row (``token_heavy_hitters_cms``).
"""

from __future__ import annotations

_HEXD = "0123456789abcdef"
# nibble value v -> 4-char binary expansion at offset v*4
_BITLUT = "0000000100100011010001010110011110001001101010111100110111101111"

P_BITS = 8  # register-index bits
M_REGS = 1 << P_BITS  # 256 registers
_RHO_BITS = 52  # 13 hex chars after the 2 index chars
_RHO_MAX = _RHO_BITS + 1  # all-zero suffix
_TWO53 = 1 << 53  # integer scale: register contribution = 2^(53-reg)


def _nib(h: str, i: int) -> str:
    """Value 0..15 of hex char ``i`` (1-based) of column ``h``."""
    return f"(instr('{_HEXD}', substr({h}, {i}, 1)) - 1)"


def hll_idx_expr(h: str) -> str:
    """Register index 0..255 from the first 2 hex chars of md5."""
    return f"({_nib(h, 1)} * 16 + {_nib(h, 2)})"


def hll_rho_expr(h: str) -> str:
    """Rank: 1-based position of the first 1-bit in md5 bits 9..60."""
    bits = "concat(" + ", ".join(
        f"substr('{_BITLUT}', {_nib(h, i)} * 4 + 1, 4)"
        for i in range(3, 16)
    ) + ")"
    return (
        f"(CASE WHEN instr({bits}, '1') = 0 THEN {_RHO_MAX}"
        f" ELSE instr({bits}, '1') END)"
    )


def hll_sint_agg_expr() -> str:
    """Order-free integer harmonic sum over a ``reg`` column: present
    registers contribute ``2^(53-reg)`` (exact BIGINT), absent ones
    ``2^53`` each. Valid aggregate-position SQL in both dialects."""
    return (
        f"(SUM(CAST(power(2.0, 53 - reg) AS BIGINT))"
        f" + ({M_REGS} - COUNT(*)) * {_TWO53})"
    )


def hll_estimate_expr(s_int: str, nonzero: str) -> str:
    """Bias-corrected estimate with the small-range linear-counting
    branch, from the integer sum and the nonzero-register count.
    alpha_256 = 0.7213/(1 + 1.079/m); thresholds per the HLL paper.
    """
    e_raw = (
        f"((0.7213 / (1.0 + 1.079 / {M_REGS}.0)) * {M_REGS * M_REGS}.0"
        f" / (CAST({s_int} AS DOUBLE) / {_TWO53}.0))"
    )
    return (
        f"(CASE WHEN {e_raw} <= {2.5 * M_REGS} AND {nonzero} < {M_REGS}"
        f" THEN {M_REGS}.0 * ln({M_REGS}.0"
        f" / CAST({M_REGS} - {nonzero} AS DOUBLE))"
        f" ELSE {e_raw} END)"
    )
