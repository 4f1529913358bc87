import sys

from tpumix.cli import main

sys.exit(main())
