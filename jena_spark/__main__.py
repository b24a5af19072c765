"""``python -m jena_spark`` — the jena-cmds entry point
(``jena-cmds/src/main/java``; see :mod:`jena_spark.cli`)."""

from jena_spark.cli import main

raise SystemExit(main())
