#!/bin/bash
# Strip non-stat noise from harness logs — analog of the reference's
# scripts/outputDBGToStats.sh (grep the debug noise out of DBG-build logs).
grep -hE "^(#matrix|#config|@computing|[A-Z_]+ ((timeAvg|wallDispatchAvg)|ERROR))" "$@"
