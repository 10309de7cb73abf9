from . import (dist_hessenberg, dist_qr, dist_refine, dist_svd, mesh,
               placement)
