from . import diffusion, engine, interp, tape
from .engine import AgeConfig, GenesisEngine, Genome
