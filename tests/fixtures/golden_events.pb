P
MainReportVersionA001Running dbt"info*0f7a3e2b0’!:
MainThreadB	¿ûžÍÀ>4
EZm"info*iv0ùÿÿÿÿÿÿÿÿ:tBÿÿÿÿÿÿÿÿÿ€Êµî