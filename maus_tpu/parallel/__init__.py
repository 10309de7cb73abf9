from . import collectives, mesh, placement
