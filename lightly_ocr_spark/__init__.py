"""lightly_ocr_spark — PySpark-native webtext main-content extraction engine.

A from-scratch graft of the reference OCR pipeline's capabilities
(dun933/lightly-ocr, read-only at /root/reference) onto Spark:

* stage 1 detect  (`ocr/net.py:100-113`)  -> HTML tokenize + block scoring
* stage 2 recognize (`ocr/net.py:174-193`) -> normalize + collapse + stitch
* serve filter   (`ocr/pipeline.py:106-112`) -> confidence threshold
* LMDB ETL plane (`ocr/tools/generator.py`) -> synthetic corpus + manifests
* CRUD/DDL plane (`ingress/db/*.go`)        -> DataFrame/SQL surface

See SURVEY.md for the full operator mapping and contract.py for the frozen
extraction specification.
"""

__version__ = "0.1.0"
