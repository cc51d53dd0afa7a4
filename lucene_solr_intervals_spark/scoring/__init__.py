from .bm25 import (  # noqa: F401
    B_DEFAULT,
    K1_DEFAULT,
    BM25Stats,
    idf,
    norm_cache,
    score_lucene,
    score_lucene_from_doclen,
    score_sql_mode,
    sloppy_freq,
)
from .smallfloat import (  # noqa: F401
    NORM_TABLE,
    byte315_to_float,
    decode_norm,
    encode_norm,
    float_to_byte315,
)
