"""`python -m deepdb_public_spark` — the maqp.py-equivalent entry
point (reference: maqp.py argparse driver)."""

import sys

from .cli import main

sys.exit(main())
