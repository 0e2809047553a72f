from .sphere import rodrigues, lonlat_to_xyz, xyz_to_lonlat
from .cameras import (
    icosahedron_rig,
    horizon_rig,
    get_K_R,
    CameraRig,
)
from .projection import (
    pers_to_equi_coords,
    pers_pix_to_equi_grid,
    equi_pix_to_pers_grid,
    remap_bilinear,
    remap_nearest,
    e2p,
    p2e,
    mp2e,
)
from .pano import pad_pano, unpad_pano
