#!/usr/bin/env python
"""Console entry point (reference: src/bin/console)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hyrise_tpu.console import main
if __name__ == "__main__":
    main()
