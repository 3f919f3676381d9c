"""run_scalar double-accumulation parity (reference scalar semantics).

The reference's non-SIMD path accumulates d^2 in double
(``/root/reference/TreeNSearch/source/TreeNSearch.cpp:2080-2086``) while
its SIMD path compares in float — so a pair at the radius boundary can
be a neighbor under one and not the other.  ``set_scalar_double_accum``
reproduces the scalar semantics on the XLA pipeline; this test finds a
boundary pair where the two precisions disagree UNDER THE ENGINE'S OWN
BACKEND ARITHMETIC (XLA CPU contracts mul+add to FMA, so numpy f32 is
not a valid predicate) and checks each mode against the jit-compiled
predicate of the same formula.

x64 is a process-global JAX config, so everything runs in a subprocess.
"""

import subprocess
import sys
import textwrap


def test_scalar_double_accum_boundary_pair():
    script = textwrap.dedent("""
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        import numpy as np
        from treensearch_tpu import TreeNSearch

        r = np.float32(0.1)
        r2_32 = np.float32(r) * np.float32(r)
        p0v = np.float32(0.25)

        # the engine's distance formula, evaluated by the same backend in
        # both precisions (fixed add order (xx+yy)+zz, ops/pipeline.py)
        @jax.jit
        def predicates(o32):
            x, y, z = o32[:, 0], o32[:, 1], o32[:, 2]
            d2f = (x * x + y * y) + z * z
            in32 = d2f <= jnp.float32(r2_32)
            o64 = o32.astype(jnp.float64)
            X, Y, Z = o64[:, 0], o64[:, 1], o64[:, 2]
            d2d = (X * X + Y * Y) + Z * Z
            in64 = d2d <= jnp.float64(r2_32)
            return in32, in64

        rng = np.random.default_rng(42)
        found = None
        for _ in range(200):
            d = rng.normal(size=(200_000, 3))
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            scale = np.float64(r) * (1 + rng.uniform(-6e-8, 6e-8,
                                                     (d.shape[0], 1)))
            # quantize through the p1 = f32(p0 + off) round trip: p1 - p0
            # is exact (same binade) -> the engine sees this offset
            p1 = (p0v + (d * scale).astype(np.float32)).astype(np.float32)
            o32 = p1 - p0v
            in32, in64 = map(np.asarray, predicates(jnp.asarray(o32)))
            flip = in32 != in64
            if flip.any():
                i = int(np.argmax(flip))
                found = (o32[i], bool(in32[i]), bool(in64[i]))
                break
        assert found is not None, "no backend f32/f64 disagreement found"
        off, in_f32, in_f64 = found

        p0 = np.array([p0v] * 3, np.float32)
        p1 = (p0 + off).astype(np.float32)
        assert np.array_equal(p1 - p0, off)
        backdrop = rng.uniform(0.5, 0.9, (30, 3)).astype(np.float32)
        pts = np.concatenate([[p0, p1], backdrop]).astype(np.float32)

        for f64, expect in ((False, in_f32), (True, in_f64)):
            ns = TreeNSearch()
            s = ns.add_point_set(pts)
            ns.set_search_radius(float(r))
            ns.set_all_searches(True)
            ns.set_scalar_double_accum(f64)
            ns.run_scalar()
            counts, nbrs = ns.get_neighbors(s, s)
            got = 1 in np.asarray(nbrs[0][: int(counts[0])])
            assert got == expect, (f64, got, expect)
        print("OK")
    """)
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=560)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "OK" in res.stdout


def test_scalar_double_accum_requires_x64():
    script = textwrap.dedent("""
        import jax
        jax.config.update("jax_platforms", "cpu")
        from treensearch_tpu import TreeNSearch
        ns = TreeNSearch()
        try:
            ns.set_scalar_double_accum(True)
        except RuntimeError as e:
            print("RAISED", e)
    """)
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=240)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "RAISED" in res.stdout
