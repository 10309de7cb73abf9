from . import diffusion, engine, interp, islands, tape
from .engine import AgeConfig, GenesisEngine, Genome
from .islands import IslandAGE
