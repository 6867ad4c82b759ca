import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
from mygpuraytracer_tpu.denoise import Device
rng = np.random.default_rng(0)
dev = Device(); dev.commit()
for (w, h) in ((1920, 1080), (1280, 720)):
    f = dev.new_filter('RT')
    f.set_image('color', rng.random((h, w, 3)).astype(np.float32))
    f.set_image('albedo', rng.random((h, w, 3)).astype(np.float32))
    out = np.zeros((h, w, 3), np.float32)
    f.set_image('output', out)
    f.set('inputScale', 1.0)
    f.commit()
    t0=time.time(); f.execute(); print(f'{w}x{h} first (compile): {time.time()-t0:.1f}s', flush=True)
    t0=time.time()
    for _ in range(6): f.execute()
    print(f'{w}x{h}: {(time.time()-t0)/6*1000:.1f} ms/image', flush=True)
