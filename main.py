#!/usr/bin/env python3
"""Repo-root shim matching the reference's ``python main.py`` entry point.
Delegates to ddti_tpu.cli.main (same flags; see that module)."""

import sys

from ddti_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main())
