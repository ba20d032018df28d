"""``python -m structa_spark <files>`` — see structa_spark.ui.cli."""

import sys

from .ui.cli import main

sys.exit(main())
