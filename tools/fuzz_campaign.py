"""Extended correctness fuzz campaign over the geometry kernels — an
opt-in, longer-running sweep than the suite's bounded hypothesis
campaigns (run per-round before shipping; results logged in the round
work log).

Checks (all pure numpy, no Spark):
1. Overlay algebra on random stars / holed / near-degenerate polygons:
   - intersection AREA two ways: the fan-triangle exact kernel
     (`intersection_area_planar`) vs area(overlay intersection) — two
     independent code paths;
   - inclusion-exclusion: |A∪B| = |A| + |B| - |A∩B|;
   - difference / symmetric difference consistency with ∩ and ∪;
   - self-union idempotence |A∪A| = |A| (the r4 coincident-chain bug
     class) and self-intersection |A∩A| = |A|.
2. DE-9IM coherence: the named predicates must equal their
   relate_pattern definitions on random pairs.
3. WKB round-trips on every generated geometry.

Usage: PYTHONPATH=/root/repo python tools/fuzz_campaign.py [n_overlay] [n_pred] [seed]
Exits nonzero on the first divergence with a reproducer dump.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from mundipy_spark.kernels import measure, overlay, predicates, wkb  # noqa: E402


def star(rng, degenerate: bool = False):
    n = int(rng.integers(3, 12))
    ang = 2 * np.pi * (np.arange(n) + rng.uniform(0.05, 0.95, n)) / n
    rad = rng.uniform(0.3, 2.8, n)
    if degenerate:
        # push vertices onto a coarse grid: collinear runs, coincident
        # chains, shared vertices between operands
        c = np.round(rng.uniform(-2, 2, 2) * 2) / 2
        pts = np.c_[c[0] + rad * np.cos(ang), c[1] + rad * np.sin(ang)]
        pts = np.round(pts * 2) / 2
        # drop consecutive duplicates the rounding may create
        keep = np.ones(len(pts), dtype=bool)
        keep[1:] = (np.abs(np.diff(pts, axis=0)).sum(axis=1)) > 0
        pts = pts[keep]
        if len(pts) < 3:
            return star(rng, degenerate=False)
    else:
        c = rng.uniform(-2, 2, 2)
        pts = np.c_[c[0] + rad * np.cos(ang), c[1] + rad * np.sin(ang)]
    return ("Polygon", [np.vstack([pts, pts[:1]])])


def holed(rng):
    outer = np.array(
        [[-3, -3], [3, -3], [3, 3], [-3, 3], [-3, -3]], dtype=float
    ) * rng.uniform(0.5, 1.2)
    cx, cy = rng.uniform(-1, 1, 2)
    r = rng.uniform(0.3, 1.0)
    ang = np.linspace(0, 2 * np.pi, 8)[:-1]
    hole = np.c_[cx + r * np.cos(ang), cy + r * np.sin(ang)]
    return ("Polygon", [outer, np.vstack([hole, hole[:1]])])


def area(g) -> float:
    return measure.geom_area_planar(g) if g is not None else 0.0


def _holes_escape(g) -> bool:
    for rings in predicates._polygons_of(g):
        if len(rings) > 1:
            shell = ("Polygon", [np.asarray(rings[0], dtype=np.float64)])
            for h in rings[1:]:
                hh = np.asarray(h, dtype=np.float64)
                if not predicates.points_in_geom(
                    hh[:, 0], hh[:, 1], shell, boundary=True
                ).all():
                    return True
    return False


def check_overlay(n: int, seed: int) -> int:
    from mundipy_spark.kernels import constructive

    rng = np.random.default_rng(seed)
    bad = 0
    for i in range(n):
        kind = i % 3
        if kind == 0:
            a, b = star(rng), star(rng)
        elif kind == 1:
            a, b = star(rng, degenerate=True), star(rng, degenerate=True)
        else:
            a, b = holed(rng), star(rng)
        # the AREA algebra below mixes conventions on escaped-hole
        # polygons: the area kernel follows the GEOS signed-ring-sum
        # convention while the region ops follow even-odd — both have
        # GEOS precedent but they disagree by 2*|hole \ shell|. Raw
        # escaped-hole input must still not CRASH (checked), then gets
        # make_valid-repaired to the even-odd-equivalent VALID form
        # for the algebra checks. (Self-intersecting single rings are
        # the documented-tolerated class: kernels interpret them
        # even-odd directly and make_valid deliberately keeps them.)
        if _holes_escape(a):
            try:
                overlay.overlay_op(a, b, "union")
                overlay.overlay_op(a, b, "intersection")
            except Exception as exc:  # noqa: BLE001
                print(f"CRASH raw-invalid overlay at {i}: {exc}")
                _dump(a, b)
                return 1
            a = constructive.make_valid(a)
            if _holes_escape(a):
                print(f"FAIL make_valid left an escaped hole at {i}")
                _dump(a, b)
                return 1
        # SELF-CROSSING rings (invalid; GEOS refuses them outright):
        # documented degraded mode — the region kernels track
        # DIFFERENT conventions on such input, example by example
        # (seed 101 ex 3052: overlay ∩=3.871 vs even-odd Monte-Carlo
        # 4.038, fan-tri agreeing with overlay; seed 90210 ex 3682:
        # overlay 0.864 == even-odd MC 0.865 while fan-tri reads
        # 0.829 on the signed convention). NOTHING about areas is
        # promised for invalid operands — the only contract is that
        # every op completes without crashing; the full algebra below
        # runs on valid operands only.
        if not (constructive.is_valid(a) and constructive.is_valid(b)):
            try:
                overlay.intersection_area_planar(a, b)
                for _op in ("intersection", "union", "difference",
                            "symmetric_difference"):
                    overlay.overlay_op(a, b, _op)
            except Exception as exc:  # noqa: BLE001
                print(f"CRASH invalid-operand overlay at {i}: {exc}")
                _dump(a, b)
                return 1
            continue
        try:
            ia = overlay.intersection_area_planar(a, b)
            gi = overlay.overlay_op(a, b, "intersection")
            gu = overlay.overlay_op(a, b, "union")
            gd = overlay.overlay_op(a, b, "difference")
            gs = overlay.overlay_op(a, b, "symmetric_difference")
            guu = overlay.overlay_op(a, a, "union")
            gii = overlay.overlay_op(a, a, "intersection")
        except Exception as exc:  # noqa: BLE001
            print(f"CRASH at {i}: {exc}")
            _dump(a, b)
            return 1
        aa, ab = area(a), area(b)
        tol = 1e-6 * max(1.0, aa + ab)
        checks = [
            ("two-kernel ∩ area", abs(ia - area(gi))),
            ("inclusion-exclusion", abs(area(gu) - (aa + ab - ia))),
            ("difference", abs(area(gd) - (aa - ia))),
            ("symdiff", abs(area(gs) - (area(gu) - ia))),
            ("self-union", abs(area(guu) - aa)),
            ("self-intersection", abs(area(gii) - aa)),
        ]
        for name, err in checks:
            if err > tol:
                print(f"FAIL {name} at {i}: err={err:.3e} tol={tol:.3e}")
                _dump(a, b)
                bad += 1
                if bad >= 3:
                    return bad
        # WKB round-trip on outputs
        for g in (gi, gu, gd, gs):
            if g is not None:
                g2 = wkb.loads(wkb.dumps(g))
                if abs(area(g2) - area(g)) > 1e-9:
                    print(f"FAIL wkb round-trip at {i}")
                    return bad + 1
    return bad


_PRED_PATTERNS = {
    # shapely/GEOS documented DE-9IM definitions for area/area pairs
    "within": "T*F**F***",
    "contains": "T*****FF*",
    "crosses": None,  # not defined for area/area
    "touches": ("FT*******", "F**T*****", "F***T****"),
    "overlaps": "T*T***T**",
    "disjoint": "FF*FF****",
}


def check_predicates(n: int, seed: int) -> int:
    rng = np.random.default_rng(seed + 1)
    bad = 0
    for i in range(n):
        a = star(rng, degenerate=(i % 2 == 0))
        b = star(rng, degenerate=(i % 3 == 0))
        try:
            m = predicates.relate(a, b)
            for name, pat in _PRED_PATTERNS.items():
                if pat is None:
                    continue
                got = getattr(predicates, name)(a, b)
                if isinstance(pat, tuple):
                    want = any(
                        predicates.relate_pattern(a, b, p) for p in pat
                    )
                else:
                    want = predicates.relate_pattern(a, b, pat)
                if got != want:
                    print(
                        f"FAIL predicate {name} at {i}: got={got} "
                        f"matrix={m}"
                    )
                    _dump(a, b)
                    bad += 1
                    if bad >= 3:
                        return bad
            # intersects == NOT disjoint, always
            if predicates.intersects(a, b) == predicates.disjoint(a, b):
                print(f"FAIL intersects/disjoint at {i}: matrix={m}")
                _dump(a, b)
                bad += 1
        except Exception as exc:  # noqa: BLE001
            print(f"CRASH predicates at {i}: {exc}")
            _dump(a, b)
            return 1
    return bad


def _dump(a, b) -> None:
    print("  A:", wkb.to_wkt(a)[:400])
    print("  B:", wkb.to_wkt(b)[:400])


def check_mixed_predicates(n: int, seed: int) -> int:
    """DE-9IM coherence for line/point vs polygon pairs: the named
    predicates must equal their dimension-appropriate relate_pattern
    definitions (crosses uses the dim(a)<dim(b) pattern T*T******;
    within/touches/disjoint patterns are dimension-generic)."""
    rng = np.random.default_rng(seed + 3)
    bad = 0
    for i in range(n):
        A = star(rng, degenerate=(i % 3 == 0))
        probe = rnd_line(rng) if i % 2 == 0 else rnd_points(rng)
        try:
            m = predicates.relate(probe, A)
            checks = {
                "within": predicates.relate_pattern(probe, A, "T*F**F***"),
                "crosses": predicates.relate_pattern(probe, A, "T*T******"),
                "disjoint": predicates.relate_pattern(probe, A, "FF*FF****"),
                "touches": (
                    predicates.relate_pattern(probe, A, "FT*******")
                    or predicates.relate_pattern(probe, A, "F**T*****")
                    or predicates.relate_pattern(probe, A, "F***T****")
                ),
            }
            for name, want in checks.items():
                got = getattr(predicates, name)(probe, A)
                if got != want:
                    print(
                        f"FAIL mixed predicate {name} at {i}: got={got} "
                        f"matrix={m}"
                    )
                    _dump(probe, A)
                    bad += 1
                    if bad >= 3:
                        return bad
            if predicates.intersects(probe, A) == predicates.disjoint(probe, A):
                print(f"FAIL mixed intersects/disjoint at {i}: {m}")
                _dump(probe, A)
                bad += 1
        except Exception as exc:  # noqa: BLE001
            print(f"CRASH mixed predicates at {i}: {exc}")
            _dump(probe, A)
            return bad + 1
    return bad


def main() -> int:
    n_ov = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    n_pr = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 2026
    bad = check_overlay(n_ov, seed)
    print(f"overlay: {n_ov} examples, {bad} failures")
    bad2 = check_predicates(n_pr, seed)
    print(f"predicates: {n_pr} examples, {bad2} failures")
    bad3 = check_mixed(n_pr, seed)
    print(f"mixed-dim: {n_pr} examples, {bad3} failures")
    bad4 = check_mixed_predicates(n_pr, seed)
    print(f"mixed-dim predicates: {n_pr} examples, {bad4} failures")
    return bad + bad2 + bad3 + bad4




def rnd_line(rng):
    n = int(rng.integers(2, 7))
    pts = rng.uniform(-3, 3, (n, 2))
    return ("LineString", pts)


def rnd_points(rng):
    n = int(rng.integers(1, 6))
    p = rng.uniform(-3, 3, (n, 2))
    return ("Point", p[0]) if n == 1 else ("MultiPoint", p)


def check_mixed(n: int, seed: int) -> int:
    """Mixed-dimension overlay invariants (the r4 point x line ops and
    the line/point x polygon clips):
    - length(line ∩ A) + length(line \\ A) == length(line);
    - every point of (points ∩ A) is PIP-inside A (boundary incl.),
      every point of (points \\ A) is PIP-outside;
    - point x line set algebra partitions the point set."""
    from mundipy_spark.kernels import measure as me

    rng = np.random.default_rng(seed + 2)
    bad = 0
    for i in range(n):
        A = star(rng, degenerate=(i % 4 == 0))
        line = rnd_line(rng)
        pts = rnd_points(rng)
        try:
            li = overlay.overlay_op(line, A, "intersection")
            ld = overlay.overlay_op(line, A, "difference")
            tot = me.geom_length_planar(line)
            got = (me.geom_length_planar(li) if li else 0.0) + (
                me.geom_length_planar(ld) if ld else 0.0
            )
            if abs(got - tot) > 1e-6 * max(1.0, tot):
                print(f"FAIL line length partition at {i}: {got} vs {tot}")
                _dump(line, A)
                bad += 1
                if bad >= 3:
                    return bad
            pi = overlay.overlay_op(pts, A, "intersection")
            pd = overlay.overlay_op(pts, A, "difference")

            def _pts(g):
                if g is None:
                    return np.empty((0, 2))
                return np.asarray(g[1], dtype=np.float64).reshape(-1, 2)

            inside = _pts(pi)
            outside = _pts(pd)
            if len(inside):
                ok = predicates.points_in_geom(
                    inside[:, 0], inside[:, 1], A, boundary=True
                )
                if not ok.all():
                    print(f"FAIL point∩A outside A at {i}")
                    _dump(pts, A)
                    bad += 1
            if len(outside):
                ok = predicates.points_in_geom(
                    outside[:, 0], outside[:, 1], A, boundary=True
                )
                if ok.any():
                    print(f"FAIL point\\A inside A at {i}")
                    _dump(pts, A)
                    bad += 1
            if len(inside) + len(outside) != _pts(pts).shape[0]:
                print(f"FAIL point partition count at {i}")
                _dump(pts, A)
                bad += 1
            # point x line: ∩ and \ partition the point set
            pl = overlay.overlay_op(pts, line, "intersection")
            pld = overlay.overlay_op(pts, line, "difference")
            if len(_pts(pl)) + len(_pts(pld)) != _pts(pts).shape[0]:
                print(f"FAIL point x line partition at {i}")
                _dump(pts, line)
                bad += 1
        except Exception as exc:  # noqa: BLE001
            print(f"CRASH mixed at {i}: {exc}")
            _dump(line, A)
            return bad + 1
    return bad


if __name__ == "__main__":
    raise SystemExit(main())
