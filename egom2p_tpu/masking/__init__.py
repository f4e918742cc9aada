from .unified import UnifiedMasking, TransferMasking
from .span import (simple_span_masking, chunk_span_masking,
                   get_sentinel_to_id_mapping, merge_span_masking,
                   split_by_sentinel)
