import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from pypic_tpu import bca, presets
from pypic_tpu.engines import bca_driver

pre = presets.pic_bca_aps(ppc=10)
n = pre.state.p.shape[0]
m_sw = bca.BinaryCollisionModel(seed=1)
m_ww = bca.BinaryCollisionModel(incident_m_amu=10.81, incident_z=5, seed=2)
for k in (1, 10):
    # warm (compile)
    bca_driver.run_bca(pre.state, pre.config, 2*k, m_sw, m_ww,
                       product_p2c=float(np.asarray(pre.state.p2c)[0]),
                       seed=3, pic_steps_per_bca=k)
    t0 = time.perf_counter()
    _, stats, _ = bca_driver.run_bca(pre.state, pre.config, 200, m_sw, m_ww,
                                     product_p2c=float(np.asarray(pre.state.p2c)[0]),
                                     seed=3, pic_steps_per_bca=k)
    el = time.perf_counter() - t0
    print(f"k={k}: {el/200*1e3:.2f} ms/step, {n*200/el:.3e} pushes/s (n={n}), yield {stats.total_yield():.3f}")
