from sparkdedup.functions.preprocess import preprocess_udf
from sparkdedup.functions.extract import extract_text_udf
from sparkdedup.functions.signatures import attach_signatures, simhash_udf

__all__ = ["preprocess_udf", "extract_text_udf", "attach_signatures", "simhash_udf"]
