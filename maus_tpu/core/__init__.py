from . import rng, types
