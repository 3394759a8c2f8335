from .camera import Camera
from .pipeline import rasterize, RasterizeConfig
