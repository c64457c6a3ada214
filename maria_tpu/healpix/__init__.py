from .core import ang2pix_ring, npix2nside, nside2npix, pix2ang_ring, ring_info  # noqa: F401
from .sht import alm2map, map2alm, synalm  # noqa: F401
