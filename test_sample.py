#!/usr/bin/env python
"""Inference CLI — same flag surface as the reference `python test_sample.py ...`."""

from infinite_texture_gans_tpu.sample import main

if __name__ == "__main__":
    main()
