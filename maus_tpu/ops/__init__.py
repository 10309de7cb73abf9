from . import batched_solve, gmres, refine, regularize
