from .predicates import (  # noqa: F401
    in_dict_col,
    is_clean_sent_col,
    is_name_col,
    is_noun_tag,
    is_stop_col,
    is_verb_tag,
    is_word_col,
    maybe_word_col,
    node_order_key,
)
