from .camera import generate_camera_rays
from .pathtrace import render_sample, make_empty_cache
from .renderer import Renderer
