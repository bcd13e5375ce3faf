#!/usr/bin/env python
"""Server entry point (reference: src/bin/server.cpp)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hyrise_tpu.server import main
if __name__ == "__main__":
    main()
