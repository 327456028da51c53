#!/bin/sh
# Sum executed ScalaTest counts from the JUnit suite reports — the
# number README.md/COVERAGE.md publish. Run AFTER a full `sbt test`;
# manual tallies drifted two rounds running (r15: 476 vs 479, r16:
# 479 vs 485), so the suite-report sum is the only source of truth.
set -e
cd "$(dirname "$0")/.."
python3 - <<'EOF'
import glob, xml.etree.ElementTree as ET
tests = failures = errors = suites = 0
for p in glob.glob('target/test-reports/*.xml'):
    r = ET.parse(p).getroot()
    suites += 1
    tests += int(r.get('tests', 0))
    failures += int(r.get('failures', 0))
    errors += int(r.get('errors', 0))
print(f"suites={suites} tests={tests} failures={failures} errors={errors}")
EOF
