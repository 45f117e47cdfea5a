"""Native (C++) host kernels shipped as source and JIT-built on first use.

``jpeg_decoder.cpp`` is the libjpeg decode+resize kernel behind
``grl_tpu.data.jpeg`` (GIL-released, PIL-bit-exact resize). The source
lives inside the package so installed wheels carry it; the binding builds
it with g++ on first use (falling back to PIL when no toolchain/libjpeg
is available) — see ``grl_tpu/data/jpeg.py`` for the build/cache logic.
"""
