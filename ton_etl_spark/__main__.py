import sys

from ton_etl_spark.cli import main

sys.exit(main())
