"""Headless render watcher: checkpoint → PNG on change.

The non-GUI replacement for the reference's Tk PPM auto-reload viewer
(``watch_ppm.py:15-46``): polls a progressive-accumulation checkpoint
(written by ``Renderer.render(checkpoint_path=...)``) and re-tonemaps it to
a PNG whenever it changes, so any image viewer / web server can follow a
long render without a display attached to the render host.

Usage: python tools/watch_render.py render.ckpt.npz preview.png [interval_s]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    ckpt, out = sys.argv[1], sys.argv[2]
    interval = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

    import numpy as np

    from path_tracer_tpu.utils.image import write_png

    last_mtime = 0.0
    while True:
        try:
            mtime = os.path.getmtime(ckpt)
        except OSError:
            time.sleep(interval)
            continue
        if mtime != last_mtime:
            last_mtime = mtime
            try:
                with np.load(ckpt) as z:
                    accum = z["accum"]
                    n = int(z["samples_done"])
                write_png(out, accum, max(n, 1))
                print(f"{time.strftime('%H:%M:%S')} {out}: {n} samples")
            except Exception as e:  # mid-write read; retry next poll
                print(f"retry: {e}")
        time.sleep(interval)


if __name__ == "__main__":
    sys.exit(main())
