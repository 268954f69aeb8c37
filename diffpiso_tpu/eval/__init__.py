from diffpiso_tpu.eval.spectra import (
    ek_spectrum_1d,
    ek_spectrum_2d,
    ek_spectrum_2d_np,
    spectral_analysis_time,
    vorticity_correlation,
    vorticity_structure,
)

__all__ = [
    "ek_spectrum_1d",
    "ek_spectrum_2d",
    "ek_spectrum_2d_np",
    "spectral_analysis_time",
    "vorticity_correlation",
    "vorticity_structure",
]
