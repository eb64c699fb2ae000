"""``python -m sec_xbrl_finwarehouse_spark`` console entry."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
