"""Tests for the AGE subsystem: tape compilation/interpretation vs direct
evaluation, diffusion sim vs a numpy oracle, and full genesis cycles."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from maus_tpu.age import diffusion, engine, interp, tape


def _eval_tree_python(node, env):
    """Independent reference evaluator for tapes (protected-op semantics)."""
    import math
    if node.kind == "const":
        return node.value
    if node.kind == "var":
        return env.get(node.name, 0.0)
    if node.kind == "unary":
        x = _eval_tree_python(node.children[0], env)
        if x is None:
            return None
        f = {"neg": lambda v: -v, "sin": math.sin, "cos": math.cos,
             "exp": lambda v: math.exp(np.clip(v, -10, 10)),
             "log": lambda v: math.log(abs(v) + 1e-9),
             "sqrt": lambda v: math.sqrt(abs(v)), "abs": abs,
             "tanh": math.tanh,
             "sig": lambda v: 1 / (1 + math.exp(-np.clip(v, -10, 10)))}[node.name]
        try:
            y = f(x)
        except (OverflowError, ValueError):
            return None
        return y if math.isfinite(y) else None
    a = _eval_tree_python(node.children[0], env)
    b = _eval_tree_python(node.children[1], env)
    if a is None or b is None:
        return None
    try:
        if node.name == "/":
            y = a / b if abs(b) > 1e-9 else float("inf")
        elif node.name == "^":
            y = a ** float(np.clip(b, -5, 5))
        else:
            y = {"+": a + b, "-": a - b, "*": a * b}[node.name]
    except (OverflowError, ValueError, ZeroDivisionError):
        return None
    import math as m
    return y if isinstance(y, float) and m.isfinite(y) else (
        y if isinstance(y, int) else None)


class TestTape:
    def test_compile_and_eval_matches_tree(self):
        rng = random.Random(0)
        n_cells = 16
        envs = [{v: rng.uniform(-2, 2) for v in tape.VARIABLES}
                for _ in range(n_cells)]
        var_mat = jnp.asarray(
            np.stack([[e[v] for e in envs] for v in tape.VARIABLES]),
            jnp.float32)
        for trial in range(30):
            tree = tape.generate_tree(rng, 0, rng.randint(1, 4))
            t = tape.compile_tree(tree)
            val, valid = interp.eval_tape(jnp.asarray(t.opcode),
                                          jnp.asarray(t.arg),
                                          jnp.asarray(t.const), var_mat)
            for i, env in enumerate(envs):
                expected = _eval_tree_python(tree, env)
                if expected is None:
                    assert not bool(valid[i]), tree.to_string()
                else:
                    assert bool(valid[i]), tree.to_string()
                    assert np.isclose(float(val[i]), expected,
                                      rtol=2e-4, atol=2e-5), tree.to_string()

    def test_complexity_is_node_count(self):
        t = tape.Node("binary", name="+", children=(
            tape.Node("var", name="m_i"), tape.Node("const", value=1.0)))
        assert t.complexity() == 3

    def test_tape_padding(self):
        t = tape.compile_tree(tape.Node("const", value=2.0))
        assert t.opcode.shape == (tape.MAX_TAPE,)
        assert t.length == 1
        assert t.opcode[1] == tape.OP_NOP


class TestDiffusion:
    def test_conv_same_matches_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.random((3, 11)).astype(np.float32)
        k = np.array([0.25, 0.5, 0.25], np.float32)
        out = diffusion._conv_same_batched(jnp.asarray(x), jnp.asarray(k))
        for p in range(3):
            np.testing.assert_allclose(np.asarray(out)[p],
                                       np.convolve(x[p], k, mode="same"),
                                       rtol=1e-5, atol=1e-6)

    def test_uniform_weight_expression_spreads(self):
        """The constant-0 expression (sigmoid→0.5 uniform weights) yields an
        N-wide normalized kernel: the state spreads near-uniformly and the
        spread fitness lands in the reference's observed band (~0.6-0.8; mass is
        NOT conserved — 'same'-mode convolution truncates at the edges, exactly
        as in the reference, K:95-105)."""
        t = tape.compile_tree(tape.Node("const", value=0.0))
        tapes = {k: jnp.asarray(np.stack([getattr(t, k)]))
                 for k in ("opcode", "arg", "const")}
        final, ok = diffusion.run_diffusion_population(
            tapes, 50, 50, jnp.asarray([0.25, 0.5, 0.25], jnp.float32))
        assert bool(ok[0])
        fit = diffusion.spread_fitness(final, ok)
        assert 0.4 < float(fit[0]) <= 1.0

    def test_failed_expression_gets_zero_fitness(self):
        final = jnp.zeros((1, 50))
        ok = jnp.asarray([False])
        assert float(diffusion.spread_fitness(final, ok)[0]) == 0.0


class TestEngine:
    def test_five_cycles_run_and_archive(self):
        """BASELINE.md row 10 config (shrunk): cycles complete, fitness in the
        plausible band, library grows."""
        eng = engine.GenesisEngine(engine.AgeConfig(candidates_per_cycle=12,
                                                    diffusion_n=32,
                                                    diffusion_t=32), seed=1)
        summaries = eng.run(5)
        assert len(summaries) == 5
        assert summaries[-1]["library_size"] > 0
        best = max(s["best_fitness"] for s in summaries)
        assert 0.05 < best <= 1.0
        # omega factors grow monotonically under logistic updates
        assert eng.K > 0 and eng.omega_integral > 0

    def test_determinism(self):
        mk = lambda: engine.GenesisEngine(
            engine.AgeConfig(candidates_per_cycle=6, diffusion_n=16,
                             diffusion_t=16), seed=7).run(2)
        s1, s2 = mk(), mk()
        assert s1[-1]["best_fitness"] == s2[-1]["best_fitness"]
        assert s1[-1]["library_size"] == s2[-1]["library_size"]


class TestViz:
    def test_plot_best_produces_heatmap(self, tmp_path):
        """K10 parity: the best genome's diffusion heatmap renders to a file."""
        from maus_tpu.age import viz
        eng = engine.GenesisEngine(engine.AgeConfig(candidates_per_cycle=8,
                                                    diffusion_n=24,
                                                    diffusion_t=24), seed=3)
        eng.run(2)
        path = viz.plot_best(eng, path=str(tmp_path / "heat.png"))
        if path is None:
            import pytest
            pytest.skip("matplotlib unavailable or empty library")
        import os
        assert os.path.getsize(path) > 1000

    def test_capture_full_grid_shape(self):
        from maus_tpu.age import viz
        eng = engine.GenesisEngine(engine.AgeConfig(candidates_per_cycle=4,
                                                    diffusion_n=16,
                                                    diffusion_t=12), seed=1)
        eng.run(1)
        if not eng.harmonic_library:
            import pytest
            pytest.skip("no archived genomes")
        grid = viz.capture_full_grid(eng.harmonic_library[0], eng.conf)
        assert grid.shape == (12, 16)
        assert np.isfinite(grid).all()
