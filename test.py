#!/usr/bin/env python3
"""Repo-root shim matching the reference's ``python test.py`` param-count
script. Delegates to ddti_tpu.cli.params."""

import sys

from ddti_tpu.cli.params import main

if __name__ == "__main__":
    sys.exit(main())
