"""HyperBall ANF semantics: register math replays a pure-Python
implementation exactly; isolated nodes keep their singleton ball;
estimates are monotone in the radius (register MAX only grows)."""

from __future__ import annotations

import hashlib
import math

from oic_options_chains_spark.operators.graph import anf_ball_sizes

M = 16
NUM = int(math.floor(0.673 * M * M * 9007199254740992))
TABLE = [int(math.floor(M * math.log(M / v))) for v in range(1, M + 1)]


def _reg(node: int) -> tuple[int, int]:
    h = hashlib.md5(str(node).encode()).hexdigest()
    reg = int(h[0], 16)
    v = int(h[1:14], 16)
    rho = 53 if v == 0 else 53 - len(bin(v)[2:])
    return reg, rho


def _python_anf(nodes, edges, rounds=2):
    und = {}
    for a, b in edges:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    regs = {n: {} for n in nodes}
    for n in nodes:
        r, rho = _reg(n)
        regs[n][r] = rho
    out = {}
    for rnd in range(1, rounds + 1):
        new = {}
        for n in nodes:
            merged = dict(regs[n])
            for nb in und.get(n, ()):
                for r, rho in regs[nb].items():
                    merged[r] = max(merged.get(r, 0), rho)
            new[n] = merged
        regs = new
        for n in nodes:
            t = sum(1 << (53 - rho) for rho in regs[n].values())
            zeros = M - len(regs[n])
            t += (1 << 53) * zeros
            raw = NUM // t
            est = TABLE[zeros - 1] if raw <= 40 and zeros > 0 else raw
            out[(n, rnd)] = (zeros, est)
    return out


def test_matches_python_replay_and_is_radius_monotone(spark):
    nodes = list(range(1, 11))
    # a path 1-2-3-4-5, a triangle 6-7-8, isolated 9 and 10
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (6, 7), (7, 8), (6, 8)]
    ndf = spark.createDataFrame([(n,) for n in nodes], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        (r["node"], r["r"]): (r["n_zero_regs"], r["estimate"])
        for r in anf_ball_sizes(ndf, edf, rounds=2, b=4).collect()
    }
    assert got == _python_anf(nodes, edges, rounds=2)
    # isolated node: singleton ball at both radii
    assert got[(9, 1)] == got[(9, 2)]
    # center of the path sees strictly more registers by r=2 than r=1
    assert got[(3, 2)][0] <= got[(3, 1)][0]
