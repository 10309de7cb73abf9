from . import (collectives, dist_hessenberg, dist_qr, dist_svd, mesh,
               placement)
