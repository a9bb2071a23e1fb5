"""`python -m reve_tpu` == the CLI (same surface as the `reve` script)."""

import sys

from reve_tpu import cli

if __name__ == "__main__":
    sys.exit(cli.run(sys.argv[1:]))
