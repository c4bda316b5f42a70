"""``python -m process_spark`` — see process_spark.cli."""

import sys

from process_spark.cli import main

sys.exit(main())
