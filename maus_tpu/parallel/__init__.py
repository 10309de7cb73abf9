from . import collectives, dist_hessenberg, dist_qr, mesh, placement
