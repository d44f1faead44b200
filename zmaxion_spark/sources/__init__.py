"""External-source connectors (SURVEY §2.1).

``kafka_wire`` / ``kafka_broker`` / ``kafka_source`` close the #5
``source_kafka`` design slot inside the sandbox: a pure-stdlib loopback
broker speaking the public Kafka v0 wire protocol, a minimal socket
client, and Python DataSources (batch + streaming) that consume it
with real partition/offset semantics.
"""
