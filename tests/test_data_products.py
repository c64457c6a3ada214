"""One place that demonstrates fetch-or-generate for EVERY data product
class (VERDICT round-1 item #4 'done' criterion): atmospheric spectra,
weather, CMB spectra, the Planck CMB map, and example input maps all
resolve through the cache -> network -> offline-generator chain."""

import numpy as np
import pytest

import maria_tpu
from maria_tpu.io import caching


def test_every_data_product_class_resolves(tmp_path, monkeypatch):
    monkeypatch.setattr(caching, "_cache_state", {"base": str(tmp_path)})

    # 1. atmospheric spectra: fetch -> synthetic am-like generator
    from maria_tpu.spectrum import AtmosphericSpectrum

    spec = AtmosphericSpectrum(region="chajnantor")
    t = np.asarray(spec.transmission(nu=np.array([150e9]), pwv=1.0,
                                     base_temperature=270.0, elevation=np.radians(60)))
    assert 0 < float(t.ravel()[0]) <= 1.0
    assert any(p.name.endswith(".h5") for p in (tmp_path / "atmosphere").rglob("*")), (
        "spectra did not go through the cache"
    )

    # 2. weather: synthetic climatology (generated in-process)
    from maria_tpu.weather import Weather

    w = Weather(region="chajnantor", time=1.75e9)
    assert w.pwv > 0

    # 3. CMB spectra: embedded ΛCDM table
    from maria_tpu.cmb import get_cmb_spectrum

    assert (get_cmb_spectrum(lmax=64)["TT"][2:] > 0).all()

    # 4. the Planck CMB map: fetch -> PLA download -> stand-in generator
    from maria_tpu.cmb import get_cmb

    cmb = get_cmb()
    assert cmb.stokes == "IQU"
    assert (tmp_path / "maps" / "planck_cmb.fits").exists()

    # 5. example input maps: fetch of the real maria-data product first,
    # synthetic stand-in offline
    m = maria_tpu.map.get("cluster")
    assert m.data.ndim == 5 and np.asarray(m.data).std() > 0

    # an unknown name still errors helpfully
    with pytest.raises(ValueError, match="not a known map"):
        maria_tpu.map.get("definitely_not_a_map")
