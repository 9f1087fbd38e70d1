"""spark-submit main shim: the zip shipped via --py-files puts the package
on every executor's sys.path; this driver-side file just dispatches to the
package CLI."""

import sys

from parser_indexer_py_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
