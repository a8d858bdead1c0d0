"""``python -m kgtk_ray <command> [options] [/ <command> ...]`` — the
reference-compatible CLI (see :mod:`kgtk_ray.cli`)."""
import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
