"""Spark's ``xxhash64`` reimplemented as DuckDB SQL — the missing
twin that kept ``dedup_minhash_fast`` rows-only.

Spark's XxHash64 (seed 42) hashes ints via ``hashInt``, longs via
``hashLong`` and strings via XXH64 over their UTF-8 bytes; multi-arg
``xxhash64(a, b, ...)`` CHAINS: each argument's full hash (including
the final avalanche) seeds the next. The Python twins below are
validated bit-for-bit against Spark (tests/test_xxhash_sql.py), and
the SQL generators emit the SAME arithmetic over DuckDB HUGEINTs:

- 64-bit wraparound multiply split into 32-bit halves (the 128-bit
  product of two 64-bit operands would overflow HUGEINT);
- rotations as ``(x * 2^r) % 2^64 + x // 2^(64-r)`` (the OR of
  disjoint bit ranges is addition);
- every step lands in its own lateral column alias, so the generated
  expression grows LINEARLY in the step count instead of
  exponentially through operand duplication.

Scope: string inputs up to 31 bytes of single-byte (ASCII) UTF-8 —
below XXH64's 32-byte stripe loop. The corpus tokens are 3-8
lowercase ASCII chars (asserted where used), far inside the bound.

Reference for the oracle subject: operators/dedup.py
``minhash_buckets(hash_fn="xxhash64")`` — per-token signatures
``xxhash64(lit(i), token)`` and band keys
``xxhash64(lit(b), mh_0..mh_{r-1})``.
"""

from __future__ import annotations

M64 = 1 << 64
MASK = M64 - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
SEED = 42  # Spark's default


# -- Python twins (validated against Spark; drive the unit tests) --------------


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def hash_int(i: int, seed: int = SEED) -> int:
    h = (seed + P5 + 4) & MASK
    h ^= ((i & 0xFFFFFFFF) * P1) & MASK
    h = (_rotl(h, 23) * P2 + P3) & MASK
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    h = (seed + P5 + 8) & MASK
    k1 = (_rotl(((value & MASK) * P2) & MASK, 31) * P1) & MASK
    h ^= k1
    h = (_rotl(h, 27) * P1 + P4) & MASK
    return _fmix(h)


def hash_bytes(b: bytes, seed: int) -> int:
    n = len(b)
    assert n < 32, "stripe loop not implemented (inputs are short)"
    h = (seed + P5 + n) & MASK
    i = 0
    while i + 8 <= n:
        k1 = int.from_bytes(b[i:i + 8], "little")
        k1 = (_rotl((k1 * P2) & MASK, 31) * P1) & MASK
        h ^= k1
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        k1 = int.from_bytes(b[i:i + 4], "little")
        h ^= (k1 * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= ((b[i] & 0xFF) * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    return _fmix(h)


def to_signed(x: int) -> int:
    return x - M64 if x >= (1 << 63) else x


# -- SQL fragment builders ------------------------------------------------------

_M64S = str(M64)


def _mul(a: str, k: int) -> str:
    """(a * k) mod 2^64 with a < 2^64 variable, k a 64-bit constant —
    32-bit split keeps every partial inside HUGEINT."""
    klo, khi = k & 0xFFFFFFFF, k >> 32
    ah = f"CAST(({a}) AS HUGEINT)"
    return (
        f"((({ah}) % 4294967296) * {klo}"
        f" + (((({ah}) % 4294967296) * {khi}"
        f" + (({ah}) // 4294967296) * {klo}) % 4294967296)"
        f" * 4294967296) % {_M64S}"
    )


def _rotl_sql(x: str, r: int) -> str:
    xh = f"CAST(({x}) AS HUGEINT)"
    return (
        f"((({xh}) * {1 << r}) % {_M64S} + ({xh}) // {1 << (64 - r)})"
        f" % {_M64S}"
    )


def _xor(a: str, b: str) -> str:
    return f"xor(CAST({a} AS HUGEINT), CAST({b} AS HUGEINT))"


def _shr_xor(h: str, r: int) -> str:
    return _xor(h, f"({h}) // {1 << r}")


def fmix_steps(prefix: str, h: str) -> list[tuple[str, str]]:
    """The avalanche as 5 lateral-alias steps ending in
    ``{prefix}_f``. Each step references only the previous ALIAS, so
    operand duplication never compounds."""
    return [
        (f"{prefix}_f1", _shr_xor(h, 33)),
        (f"{prefix}_f2", _mul(f"{prefix}_f1", P2)),
        (f"{prefix}_f3", _shr_xor(f"{prefix}_f2", 29)),
        (f"{prefix}_f4", _mul(f"{prefix}_f3", P3)),
        (f"{prefix}_f", _shr_xor(f"{prefix}_f4", 32)),
    ]


def shared_token_steps(t: str) -> list[tuple[str, str]]:
    """Length-independent contributions shared by ALL seeds over one
    ASCII token column ``t`` (3..8 bytes): the 8-byte word's k1, the
    4-byte chunk's k1, and the three tail-byte products."""
    def byte(pos: str) -> str:
        return f"ord(substr({t}, {pos}, 1))"

    load64 = " + ".join(
        f"CAST({byte(str(j + 1))} AS HUGEINT) * {1 << (8 * j)}"
        for j in range(8)
    )
    load32 = " + ".join(
        f"CAST({byte(str(j + 1))} AS HUGEINT) * {1 << (8 * j)}"
        for j in range(4)
    )
    steps: list[tuple[str, str]] = [
        ("xx_len", f"length({t})"),
        # k1 for the len=8 word path: rotl31(w*P2)*P1
        ("xx_w8", f"CASE WHEN xx_len >= 8 THEN {load64} ELSE 0 END"),
        ("xx_kw_a", _mul("xx_w8", P2)),
        ("xx_kw_b", _rotl_sql("xx_kw_a", 31)),
        ("xx_kw", _mul("xx_kw_b", P1)),
        # k1 for the 4-byte path (len 4..7): l4*P1
        ("xx_l4",
         f"CASE WHEN xx_len >= 4 AND xx_len < 8 THEN {load32} ELSE 0 END"),
        ("xx_k4", _mul("xx_l4", P1)),
        # tail bytes (start 5 when a 4-byte chunk ran, else 1) * P5
        ("xx_ts", "CASE WHEN xx_len >= 8 THEN 99 "
                  "WHEN xx_len >= 4 THEN 5 ELSE 1 END"),
    ]
    for j in range(3):
        steps.append((
            f"xx_kb{j}",
            f"CASE WHEN xx_ts + {j} <= xx_len THEN "
            f"{_mul(byte(f'xx_ts + {j}'), P5)} ELSE 0 END",
        ))
    return steps


def token_hash_steps(prefix: str, seed: int) -> list[tuple[str, str]]:
    """XXH64 of the token under ``seed``, consuming the shared
    ``xx_*`` aliases; ends in ``{prefix}_f`` (unsigned HUGEINT)."""
    p = prefix
    steps: list[tuple[str, str]] = [
        (f"{p}_h0",
         f"(CAST({(seed + P5) & MASK} AS HUGEINT) + xx_len) % {_M64S}"),
        # word step (len = 8 only)
        (f"{p}_hw_x", _xor(f"{p}_h0", "xx_kw")),
        (f"{p}_hw_r", _rotl_sql(f"{p}_hw_x", 27)),
        (f"{p}_hw_m", f"({_mul(f'{p}_hw_r', P1)} + {P4}) % {_M64S}"),
        (f"{p}_hw",
         f"CASE WHEN xx_len >= 8 THEN {p}_hw_m ELSE {p}_h0 END"),
        # 4-byte step (len 4..7)
        (f"{p}_h4_x", _xor(f"{p}_hw", "xx_k4")),
        (f"{p}_h4_r", _rotl_sql(f"{p}_h4_x", 23)),
        (f"{p}_h4_m", f"({_mul(f'{p}_h4_r', P2)} + {P3}) % {_M64S}"),
        (f"{p}_h4",
         f"CASE WHEN xx_len >= 4 AND xx_len < 8 THEN {p}_h4_m "
         f"ELSE {p}_hw END"),
    ]
    prev = f"{p}_h4"
    for j in range(3):
        steps += [
            (f"{p}_b{j}_x", _xor(prev, f"xx_kb{j}")),
            (f"{p}_b{j}_r", _rotl_sql(f"{p}_b{j}_x", 11)),
            (f"{p}_b{j}_m", _mul(f"{p}_b{j}_r", P1)),
            (f"{p}_b{j}",
             f"CASE WHEN xx_ts + {j} <= xx_len THEN {p}_b{j}_m "
             f"ELSE {prev} END"),
        ]
        prev = f"{p}_b{j}"
    steps += fmix_steps(p, prev)
    return steps


def hash_long_steps(
    prefix: str, value: str, seed: str | int
) -> list[tuple[str, str]]:
    """``hashLong(value, seed)`` as alias steps; ``value`` must be an
    UNSIGNED 64-bit expression; ends in ``{prefix}_f``."""
    p = prefix
    seed_plus = (
        f"({seed} + {(P5 + 8) & MASK}) % {_M64S}"
        if isinstance(seed, str)
        else str((seed + P5 + 8) & MASK)
    )
    steps = [
        (f"{p}_k_a", _mul(value, P2)),
        (f"{p}_k_b", _rotl_sql(f"{p}_k_a", 31)),
        (f"{p}_k", _mul(f"{p}_k_b", P1)),
        (f"{p}_h0", seed_plus),
        (f"{p}_hx", _xor(f"{p}_h0", f"{p}_k")),
        (f"{p}_hr", _rotl_sql(f"{p}_hx", 27)),
        (f"{p}_hm", f"({_mul(f'{p}_hr', P1)} + {P4}) % {_M64S}"),
    ]
    steps += fmix_steps(p, f"{p}_hm")
    return steps


def signed_sql(x: str) -> str:
    return (
        f"CAST(CASE WHEN ({x}) >= {1 << 63} THEN ({x}) - {_M64S} "
        f"ELSE ({x}) END AS BIGINT)"
    )


def unsigned_sql(x: str) -> str:
    """Signed BIGINT column → unsigned HUGEINT in [0, 2^64)."""
    return (
        f"CASE WHEN CAST({x} AS HUGEINT) < 0 "
        f"THEN CAST({x} AS HUGEINT) + {_M64S} "
        f"ELSE CAST({x} AS HUGEINT) END"
    )


def layered_cte_sql(
    base_cte: str,
    base_name: str,
    steps: list[tuple[str, str]],
    carry: list[str],
    final_select: str,
    layer_size: int = 4,
) -> str:
    """Assemble step chains into MATERIALIZED CTE layers.

    DuckDB expands lateral column aliases (and single-use CTEs) by
    SUBSTITUTION — a 26-step chain whose steps each reference the
    previous alias twice inlines into a 2^26-node expression tree and
    hangs the planner. Forcing one MATERIALIZED layer per few steps
    keeps the tree linear: each layer evaluates its expressions over
    REAL columns of the previous layer. Steps are greedily packed
    ``layer_size`` per layer under the constraint that a step never
    references an alias defined in its own layer.
    """
    layers: list[list[tuple[str, str]]] = []
    current: list[tuple[str, str]] = []
    current_names: set[str] = set()
    for alias, expr in steps:
        if len(current) >= layer_size or any(
            n in expr for n in current_names
        ):
            layers.append(current)
            current, current_names = [], set()
        current.append((alias, expr))
        current_names.add(alias)
    if current:
        layers.append(current)

    parts = [f"{base_name} AS MATERIALIZED ({base_cte})"]
    prev = base_name
    for k, layer in enumerate(layers):
        name = f"{base_name}_x{k}"
        exprs = ", ".join(f"{e} AS {a}" for a, e in layer)
        parts.append(
            f"{name} AS MATERIALIZED (SELECT *, {exprs} FROM {prev})"
        )
        prev = name
    sel = final_select.format(last=prev)
    return ",\n".join(parts), prev, sel


def interleave(chains: list[list[tuple[str, str]]]) -> list[tuple[str, str]]:
    """Round-robin steps from independent chains so the layer packer
    can place one step of EVERY chain per layer (sequential chains
    would otherwise force one layer per step)."""
    out: list[tuple[str, str]] = []
    longest = max((len(c) for c in chains), default=0)
    for j in range(longest):
        for c in chains:
            if j < len(c):
                out.append(c[j])
    return out
