"""Physics/forward-model blocks and analysis layers."""
from . import (telescope, sky, beam, beam_ylm, rime, linear_model, bessel,
               calibration, coupling, cosmology, fft, filt, imaging)
from .telescope import TelescopeModel, ArrayModel, build_reds
from .sky import (
    PointSky, PixelSky, PointSkyResponse, PixelSkyResponse, CompositeModel,
    Stokes2Coherency,
)
from .beam import (
    PixelBeam, GaussResponse, AiryResponse, UniformResponse, PixelResponse,
)
from .beam_ylm import YlmResponse, AlmBeam
from .rime import RIME
from .linear_model import LinearModel, DictLM, MultiLM
from .calibration import JonesModel, JonesResponse, VisModel, RedVisModel
from .cosmology import Cosmology
from .fft import FFT, PeakDelay, vis_wedge
from .filt import MatFilter, GPFilter, LstSqFilter, WedgeFilter
from .imaging import VisMapper
from .coupling import VisCoupling, RedVisCoupling, CouplingInflate
