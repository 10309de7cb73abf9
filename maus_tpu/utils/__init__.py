from . import checkpoint, metrics, truth
