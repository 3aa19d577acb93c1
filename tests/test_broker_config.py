"""Publisher security config parity (resubmitter-api/lib/publisher/kafka/
kafka.go, kerberos.go, env.go): env contract -> Spark Kafka sink options.
Pure-python mapping tests — no broker needed."""

import pytest

from persistor_spark.sources import brokers


FULL_KRB_ENV = {
    "KRB_CONFIG_PATH": "/etc/krb5.conf",
    "KRB_KEY_TAB": "/etc/security/kafka.keytab",
    "KRB_REALM": "EXAMPLE.COM",
    "KRB_SERVICE_NAME": "kafka",
    "KRB_USERNAME": "svc-resubmit",
}


def test_kerberos_env_requires_every_variable():
    """kerberos.go:27-60: the FIRST missing variable is reported by name."""
    for missing in FULL_KRB_ENV:
        env = {k: v for k, v in FULL_KRB_ENV.items() if k != missing}
        with pytest.raises(brokers.EnvVariableNotDefined) as e:
            brokers.load_kerberos_config_from_env(env)
        assert e.value.key == missing
    cfg = brokers.load_kerberos_config_from_env(FULL_KRB_ENV)
    assert cfg.realm == "EXAMPLE.COM" and cfg.service == "kafka"


def test_kerberos_options_mapping():
    cfg = brokers.load_kerberos_config_from_env(FULL_KRB_ENV)
    opts = brokers.kafka_security_options(use_tls=True, kerberos=cfg)
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "GSSAPI"
    assert opts["kafka.sasl.kerberos.service.name"] == "kafka"
    jaas = opts["kafka.sasl.jaas.config"]
    assert 'keyTab="/etc/security/kafka.keytab"' in jaas
    assert 'principal="svc-resubmit@EXAMPLE.COM"' in jaas
    assert opts["__jvm.java.security.krb5.conf"] == "/etc/krb5.conf"


def test_sasl_plain_and_tls_mapping():
    opts = brokers.kafka_security_options(
        use_tls=True, sasl_username="u", sasl_password="p"
    )
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "PLAIN"
    assert 'username="u" password="p"' in opts["kafka.sasl.jaas.config"]
    # TLS only
    assert brokers.kafka_security_options(use_tls=True) == {
        "kafka.security.protocol": "SSL"
    }
    # skip_verify disables hostname verification, kafka-style (empty algo)
    opts = brokers.kafka_security_options(use_tls=True, skip_verify=True)
    assert opts["kafka.ssl.endpoint.identification.algorithm"] == ""


def test_publisher_options_from_env_full():
    env = dict(
        FULL_KRB_ENV,
        KAFKA_BROKERS="k1:9092,k2:9092",
        KAFKA_USE_TLS="true",
        ENABLE_KERBEROS="true",
        KAFKA_BATCH_BYTES="500000",
        KAFKA_BATCH_TIMEOUT="10",
        KAFKA_DISABLE_COMPRESSION="true",
    )
    opts = brokers.kafka_publisher_options_from_env(env)
    assert opts["kafka.bootstrap.servers"] == "k1:9092,k2:9092"
    assert opts["kafka.batch.size"] == "500000"
    assert opts["kafka.linger.ms"] == "10"
    assert opts["kafka.compression.type"] == "none"
    assert opts["kafka.sasl.mechanism"] == "GSSAPI"
    # ordering contract always on (R7)
    assert opts["kafka.max.in.flight.requests.per.connection"] == "1"


def test_publisher_options_require_brokers():
    with pytest.raises(brokers.EnvVariableNotDefined) as e:
        brokers.kafka_publisher_options_from_env({})
    assert e.value.key == "KAFKA_BROKERS"
