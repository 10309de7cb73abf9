from . import api, candidate, diagnose, evolve, hermitian, population, strategy
