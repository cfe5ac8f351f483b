"""Plotting smoke test (Agg backend)."""
import matplotlib

matplotlib.use("Agg")

import numpy as np

from fastbox_tpu.plot import animate_field


def test_animate_field(rng):
    field = rng.standard_normal((4, 8, 8))
    anim = animate_field(field, axis=0)
    # Render the first couple of frames
    anim._init_draw()
    for i in range(2):
        anim._draw_frame(i)
    import matplotlib.pyplot as plt

    plt.close("all")
