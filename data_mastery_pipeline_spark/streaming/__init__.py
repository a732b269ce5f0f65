"""Structured Streaming layer (SURVEY §2.J, §7 step 9).

Design rule: every analytical transformation is a pure
``DataFrame -> DataFrame`` function that works on BOTH batch and
streaming frames — streaming adds only the event-time contract
(``withWatermark``) and the sink/trigger discipline. The reference's
hand-rolled consumer loop (kafka_consumer_s3.py:176-241) becomes
``readStream`` + trigger; its offset-after-write commit protocol
(kafka_consumer_s3.py:226-265) becomes checkpoint + idempotent sink.
"""
