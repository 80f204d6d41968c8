from corrla_rs_tpu.utils.prng import as_key, split_key
