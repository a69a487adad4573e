"""`python -m gridpp_tpu` runs the CLI client."""
import sys

from .client import main

sys.exit(main())
