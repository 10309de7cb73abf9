from . import checkpoint, metrics, truth, xfer
