from .mesh import make_mesh
from .sharded import render_multichip_sample, sharded_render_step
