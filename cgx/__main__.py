"""``python -m cgx`` entry point."""
import sys

from cgx.cli import main

sys.exit(main())
