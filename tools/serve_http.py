#!/usr/bin/env python
"""Shim for the HTTP prediction server (`d2r-serve` console script).

Usage: python tools/serve_http.py --load_path .../best_model [--port 8000]
See d2r_tpu/server.py for the design (micro-batched Predictor dispatch,
training-pipeline preprocessing, stdlib ThreadingHTTPServer).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from d2r_tpu.server import main

if __name__ == "__main__":
    main()
