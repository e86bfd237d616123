#!/usr/bin/env python
"""Top-level shim: ``python main.py --mode train|test ...`` — the reference's
invocation shape (reference: main.py:53-60) on top of uegan_tpu."""

from uegan_tpu.cli import run

if __name__ == "__main__":
    run()
