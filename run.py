#!/usr/bin/env python
"""Drop-in experiment entry point (same CLI surface as the reference's
run.py; see d2r_tpu/cli.py for the implementation)."""

from d2r_tpu.cli import main

if __name__ == "__main__":
    main()
