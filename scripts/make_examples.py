"""Render example images (beauty/albedo/denoised) for docs/examples."""
import sys, os, time
sys.path.insert(0, '/root/repo')
import numpy as np
from mygpuraytracer_tpu.scene.builtin import cornell_box, cornell_glass
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.utils.png import write_png

os.makedirs('examples', exist_ok=True)
for name, maker, spp in (('cornell', cornell_box, 2048), ('cornellGlass', cornell_glass, 2048)):
    s = maker(resolution=(400, 400))
    r = Renderer(s, RenderOptions(megakernel=True), seed=0)
    t0 = time.time()
    out, beauty = r.render_denoised(iterations=spp, batch=128)
    print(f'{name}: {spp}spp in {time.time()-t0:.1f}s, beauty mean {beauty.mean():.3f}', flush=True)
    write_png(f'examples/{name}_beauty_{spp}spp.png', beauty[:, ::-1])
    write_png(f'examples/{name}_albedo.png', r.albedo_image()[:, ::-1])
    write_png(f'examples/{name}_denoised.png', out[:, ::-1])

    # low-spp noisy + denoised pair to show the denoiser working
    r2 = Renderer(s, RenderOptions(megakernel=True), seed=7)
    out2, noisy = r2.render_denoised(iterations=16, batch=16)
    write_png(f'examples/{name}_noisy_16spp.png', noisy[:, ::-1])
    write_png(f'examples/{name}_denoised_16spp.png', out2[:, ::-1])
print('done')
