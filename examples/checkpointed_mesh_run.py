"""Stateful mesh runs: checkpoint/resume and mid-run operand swap.

Demonstrates the round-4 surfaces:

* ``solve(mesh=, checkpoint_path=, checkpoint_every=)`` — periodic carry
  saves; kill the process at any point and resume bit-exactly;
* ``MeshSolver`` — the class API for mesh runs: stage once, evolve with
  checkpoints, swap the operand mid-run (the reference's scenario-1 dynamic
  system, AMS:645-652) and continue the SAME population against the new
  system via ``resume_from``.

Run anywhere with 8 visible devices (real chips or virtual):

    JAX_PLATFORMS=cpu python examples/checkpointed_mesh_run.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MAUS_EXAMPLE_BACKEND") != "native":
    # Default to 8 virtual CPU devices, switched BEFORE any backend touch:
    # probing a pre-registered accelerator backend first (jax.devices())
    # blocks indefinitely when its transport is down, and this example needs
    # 8 devices either way. Set MAUS_EXAMPLE_BACKEND=native on a real
    # multi-chip slice to use it unchanged.
    import jax.extend.backend as _jeb

    _jeb.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np

import maus_tpu
from maus_tpu.core.types import ProblemType
from maus_tpu.parallel import mesh as mesh_mod
from maus_tpu.problems import generators as gen

mesh = mesh_mod.make_mesh(replica=1, model=8)
ckpt = os.path.join(tempfile.mkdtemp(), "carry.npz")

# --- 1) functional API: periodic checkpointing + bit-exact resume -----------
A, b = gen.ill_conditioned_system(64, cond=1e4, seed=0)
rep1 = maus_tpu.solve(A, b, tol=1e-10, num_candidates=8, max_iterations=4,
                      mesh=mesh, checkpoint_path=ckpt, checkpoint_every=2)
print(f"partial run: {rep1.iterations} iterations, checkpoint saved")

rep2 = maus_tpu.solve(A, b, tol=1e-10, num_candidates=8, max_iterations=40,
                      mesh=mesh, resume_from=ckpt)
x = rep2.best()[0]
print(f"resumed run: rel residual "
      f"{np.linalg.norm(A @ x - b) / np.linalg.norm(b):.2e}")

# --- 2) MeshSolver: operand swap mid-run (dynamic system) --------------------
A1, b1 = gen.dynamic_solve_system(32, t_step=0)
A2, b2 = gen.dynamic_solve_system(32, t_step=5)

s = maus_tpu.MeshSolver(A1, ProblemType.SOLVE_LINEAR_SYSTEM, mesh,
                        b_vector=b1, initial_num_candidates=6)
s.evolve(max_iterations=10, checkpoint_path=ckpt)
print("pre-swap run checkpointed")

s.update_problem(matrix=A2, b_vector=b2)       # the system moved in time
rep3 = s.evolve(max_iterations=40, resume_from=ckpt)   # same population
x2 = rep3.solutions[0][0]
print(f"post-swap rel residual vs NEW system: "
      f"{np.linalg.norm(A2 @ x2 - b2) / np.linalg.norm(b2):.2e}")

# --- 3) per-iteration telemetry on the mesh ----------------------------------
rep4 = s.evolve(max_iterations=10, collect_metrics=True)
energy = rep4.metrics["landscape_energy"]
print(f"telemetry: {energy.shape[0]} iterations, "
      f"final landscape energy {float(energy[rep4.iterations - 1]):.3f}")
