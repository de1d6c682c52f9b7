from aesara_tpu.graph.rewriting import basic, db, utils
