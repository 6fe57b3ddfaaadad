from sanctum_spark.codec.msgpack_codec import (
    pack,
    unpack,
    roundtrip,
    UnrecognizedMessagePackTag,
    NotSerializable,
)

__all__ = ["pack", "unpack", "roundtrip", "UnrecognizedMessagePackTag", "NotSerializable"]
