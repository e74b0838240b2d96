from .encoding import encode_base, encode_seq, decode_base, decode_seq

__all__ = ["encode_base", "encode_seq", "decode_base", "decode_seq"]
