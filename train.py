#!/usr/bin/env python
"""Training CLI — same flag surface as the reference `python train.py ...`."""

from infinite_texture_gans_tpu.train.train_loop import main

if __name__ == "__main__":
    main()
