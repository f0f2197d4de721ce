#!/usr/bin/env python
"""glider example — thin wrapper over the registry CLI (reference analogue:
c3sc/examples/glider main.c; SURVEY.md §2.1)."""
import sys
from c3sc_tpu.cli import main

if __name__ == "__main__":
    main(["glider"] + sys.argv[1:])
