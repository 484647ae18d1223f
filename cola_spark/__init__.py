"""cola_spark — a PySpark-native reimplementation of the capabilities of
brightgems/cola (distributed crawl scheduler: MQ frontier, bloom dedup,
budget/speed control), rebuilt as DataFrame dataflows over snapshot
tables of image+caption pairs.

Not a port: the reference is a Python-2 master/worker framework with a
pickled-object file queue (cola/core/mq), a bloom-filter seen set
(cola/core/bloomfilter.py), and RPC budget/speed/counter servers
(cola/functions/*). Here every one of those subsystems is a declarative
Spark plan over fixed-schema columnar tables; see SURVEY.md §2 for the
operator-by-operator mapping.
"""

__version__ = "0.1.0"
