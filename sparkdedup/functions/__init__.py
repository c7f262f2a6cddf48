from sparkdedup.functions.preprocess import preprocess_udf
from sparkdedup.functions.extract import extract_text_udf
from sparkdedup.functions.signatures import minhash_udf, simhash_udf

__all__ = ["preprocess_udf", "extract_text_udf", "minhash_udf", "simhash_udf"]
